from . import al, functions, ilqr, pscan, riccati
