from . import benchmarking, derivative_check, logging, timer
