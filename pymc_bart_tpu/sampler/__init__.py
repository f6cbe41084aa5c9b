from . import hmc, pgbart
from .compound import PGBART, CompiledModel, sample

__all__ = ["hmc", "pgbart", "PGBART", "CompiledModel", "sample"]
