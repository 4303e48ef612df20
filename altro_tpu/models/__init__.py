from . import problems, triple_integrator, unicycle
from . import cartpole, quadrotor
