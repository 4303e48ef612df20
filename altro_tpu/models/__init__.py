from . import problems, triple_integrator, unicycle
