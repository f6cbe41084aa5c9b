from .posterior import PosteriorForests, predict_draw_indices, sample_posterior

__all__ = ["PosteriorForests", "predict_draw_indices", "sample_posterior"]
