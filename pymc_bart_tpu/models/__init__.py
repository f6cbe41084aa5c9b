from .expr import Const, Expr, Op, evaluate, math
from .inference_data import Coord, DataArray, Dataset, InferenceData
from .model import (
    BART,
    BARTRV,
    Bernoulli,
    Categorical,
    Data,
    Deterministic,
    Exponential,
    FreeRV,
    Gamma,
    HalfNormal,
    LogNormal,
    Model,
    NegativeBinomial,
    Normal,
    ObservedRV,
    Poisson,
    StudentT,
    Uniform,
    preprocess_xy,
    set_data,
)

__all__ = [
    "Const", "Expr", "Op", "evaluate", "math",
    "Coord", "DataArray", "Dataset", "InferenceData",
    "BART", "BARTRV", "Bernoulli", "Categorical", "Data", "Deterministic",
    "Exponential", "FreeRV", "Gamma", "HalfNormal", "LogNormal", "Model",
    "NegativeBinomial", "Normal", "ObservedRV", "Poisson", "StudentT",
    "Uniform", "preprocess_xy", "set_data",
]
