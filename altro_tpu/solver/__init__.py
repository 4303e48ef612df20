from . import al, functions, ilqr, pscan, riccati
from . import batched, compaction
