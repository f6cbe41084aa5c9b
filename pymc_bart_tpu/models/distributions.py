"""Distribution nodes: priors for NUTS/HMC-updated free RVs and
observation likelihoods.

Covers the model families the reference exercises through PyMC
(Normal/HalfNormal regression, Bernoulli classification, Categorical
softmax — reference tests/test_bart.py:54-58,149-157 — plus the count
likelihoods used in the pymc-examples notebooks the docs pull in:
Poisson/NegativeBinomial, reference docs/examples.rst:4-10).

Each distribution provides ``logp(value, *params)`` (jnp, broadcasting),
``sample(key, shape, *params)`` for prior/posterior-predictive draws, and
free RVs carry a bijective transform to unconstrained space for HMC.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

_LOG_2PI = 1.8378770664093453
_HALF_LOG_2_OVER_PI = -0.22579135264472741  # log(sqrt(2/pi))


# ---------------------------------------------------------------------------
# transforms (unconstrained <-> constrained), with log|Jacobian|
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Transform:
    name: str

    def forward(self, u):  # unconstrained -> constrained
        raise NotImplementedError

    def log_jac(self, u):  # log|d constrained / d u|
        raise NotImplementedError

    def inverse(self, x):  # constrained -> unconstrained
        raise NotImplementedError


class IdentityTransform(Transform):
    def __init__(self):
        super().__init__("identity")

    def forward(self, u):
        return u

    def log_jac(self, u):
        return jnp.zeros_like(u)

    def inverse(self, x):
        return x


class LogTransform(Transform):
    """positive support: x = exp(u)."""

    def __init__(self):
        super().__init__("log")

    def forward(self, u):
        return jnp.exp(u)

    def log_jac(self, u):
        return u

    def inverse(self, x):
        return jnp.log(x)


class IntervalTransform(Transform):
    """bounded support (a, b): x = a + (b-a)*sigmoid(u)."""

    def __init__(self, lower, upper):
        super().__init__("interval")
        object.__setattr__(self, "lower", float(lower))
        object.__setattr__(self, "upper", float(upper))

    def forward(self, u):
        return self.lower + (self.upper - self.lower) * jax.nn.sigmoid(u)

    def log_jac(self, u):
        return (
            jnp.log(self.upper - self.lower)
            + jax.nn.log_sigmoid(u)
            + jax.nn.log_sigmoid(-u)
        )

    def inverse(self, x):
        z = (x - self.lower) / (self.upper - self.lower)
        z = jnp.clip(z, 1e-6, 1 - 1e-6)
        return jnp.log(z) - jnp.log1p(-z)


IDENTITY = IdentityTransform()
LOG = LogTransform()


# ---------------------------------------------------------------------------
# distribution families
# ---------------------------------------------------------------------------


class Dist:
    """Static family descriptor; subclasses define logp/sample/etc."""

    transform: Transform = IDENTITY
    discrete = False

    @staticmethod
    def logp(value, *params):
        raise NotImplementedError

    @staticmethod
    def sample(key, shape, *params):
        raise NotImplementedError

    @staticmethod
    def support_point(shape, *params):
        raise NotImplementedError


class NormalDist(Dist):
    @staticmethod
    def logp(value, mu, sigma):
        sigma = jnp.maximum(sigma, 1e-12)
        return -0.5 * ((value - mu) / sigma) ** 2 - jnp.log(sigma) - 0.5 * _LOG_2PI

    @staticmethod
    def sample(key, shape, mu, sigma):
        return mu + sigma * jax.random.normal(key, shape)

    @staticmethod
    def support_point(shape, mu, sigma):
        return jnp.broadcast_to(mu, shape)


class HalfNormalDist(Dist):
    transform = LOG

    @staticmethod
    def logp(value, sigma):
        sigma = jnp.maximum(sigma, 1e-12)
        lp = _HALF_LOG_2_OVER_PI - jnp.log(sigma) - 0.5 * (value / sigma) ** 2
        return jnp.where(value >= 0, lp, -jnp.inf)

    @staticmethod
    def sample(key, shape, sigma):
        return jnp.abs(sigma * jax.random.normal(key, shape))

    @staticmethod
    def support_point(shape, sigma):
        return jnp.broadcast_to(sigma * 0.8, shape)


class ExponentialDist(Dist):
    transform = LOG

    @staticmethod
    def logp(value, lam):
        lam = jnp.maximum(lam, 1e-12)
        return jnp.where(value >= 0, jnp.log(lam) - lam * value, -jnp.inf)

    @staticmethod
    def sample(key, shape, lam):
        return jax.random.exponential(key, shape) / lam

    @staticmethod
    def support_point(shape, lam):
        return jnp.broadcast_to(1.0 / lam, shape)


class GammaDist(Dist):
    transform = LOG

    @staticmethod
    def logp(value, alpha, beta):
        lp = (
            alpha * jnp.log(beta)
            - jsp.gammaln(alpha)
            + (alpha - 1.0) * jnp.log(jnp.maximum(value, 1e-38))
            - beta * value
        )
        return jnp.where(value > 0, lp, -jnp.inf)

    @staticmethod
    def sample(key, shape, alpha, beta):
        return jax.random.gamma(key, alpha, shape) / beta

    @staticmethod
    def support_point(shape, alpha, beta):
        return jnp.broadcast_to(alpha / beta, shape)


class LogNormalDist(Dist):
    transform = LOG

    @staticmethod
    def logp(value, mu, sigma):
        sigma = jnp.maximum(sigma, 1e-12)
        logv = jnp.log(jnp.maximum(value, 1e-38))
        lp = -0.5 * ((logv - mu) / sigma) ** 2 - logv - jnp.log(sigma) - 0.5 * _LOG_2PI
        return jnp.where(value > 0, lp, -jnp.inf)

    @staticmethod
    def sample(key, shape, mu, sigma):
        return jnp.exp(mu + sigma * jax.random.normal(key, shape))

    @staticmethod
    def support_point(shape, mu, sigma):
        return jnp.broadcast_to(jnp.exp(mu + 0.5 * sigma**2), shape)


class UniformDist(Dist):
    @staticmethod
    def logp(value, lower, upper):
        inside = (value >= lower) & (value <= upper)
        return jnp.where(inside, -jnp.log(upper - lower), -jnp.inf)

    @staticmethod
    def sample(key, shape, lower, upper):
        return jax.random.uniform(key, shape, minval=lower, maxval=upper)

    @staticmethod
    def support_point(shape, lower, upper):
        return jnp.broadcast_to((lower + upper) / 2.0, shape)


class StudentTDist(Dist):
    @staticmethod
    def logp(value, nu, mu, sigma):
        sigma = jnp.maximum(sigma, 1e-12)
        z = (value - mu) / sigma
        return (
            jsp.gammaln((nu + 1) / 2)
            - jsp.gammaln(nu / 2)
            - 0.5 * jnp.log(nu * jnp.pi)
            - jnp.log(sigma)
            - (nu + 1) / 2 * jnp.log1p(z**2 / nu)
        )

    @staticmethod
    def sample(key, shape, nu, mu, sigma):
        return mu + sigma * jax.random.t(key, nu, shape)

    @staticmethod
    def support_point(shape, nu, mu, sigma):
        return jnp.broadcast_to(mu, shape)


class BernoulliDist(Dist):
    discrete = True

    @staticmethod
    def logp(value, p):
        p = jnp.clip(p, 1e-7, 1 - 1e-7)
        return value * jnp.log(p) + (1 - value) * jnp.log1p(-p)

    @staticmethod
    def sample(key, shape, p):
        return jax.random.bernoulli(key, p, shape).astype(jnp.float32)

    @staticmethod
    def support_point(shape, p):
        return jnp.broadcast_to((p > 0.5).astype(jnp.float32), shape)


class PoissonDist(Dist):
    discrete = True

    @staticmethod
    def logp(value, mu):
        mu = jnp.maximum(mu, 1e-12)
        return value * jnp.log(mu) - mu - jsp.gammaln(value + 1.0)

    @staticmethod
    def sample(key, shape, mu):
        return jax.random.poisson(key, mu, shape).astype(jnp.float32)

    @staticmethod
    def support_point(shape, mu):
        return jnp.broadcast_to(jnp.floor(mu), shape)


class NegativeBinomialDist(Dist):
    """PyMC (mu, alpha) parameterization."""

    discrete = True

    @staticmethod
    def logp(value, mu, alpha):
        mu = jnp.maximum(mu, 1e-12)
        alpha = jnp.maximum(alpha, 1e-12)
        return (
            jsp.gammaln(value + alpha)
            - jsp.gammaln(alpha)
            - jsp.gammaln(value + 1.0)
            + alpha * (jnp.log(alpha) - jnp.log(alpha + mu))
            + value * (jnp.log(mu) - jnp.log(alpha + mu))
        )

    @staticmethod
    def sample(key, shape, mu, alpha):
        k1, k2 = jax.random.split(key)
        lam = jax.random.gamma(k1, alpha, shape) * (mu / alpha)
        return jax.random.poisson(k2, lam).astype(jnp.float32)

    @staticmethod
    def support_point(shape, mu, alpha):
        return jnp.broadcast_to(jnp.floor(mu), shape)


class CategoricalDist(Dist):
    """p has categories on the LAST axis; value holds integer labels."""

    discrete = True

    @staticmethod
    def logp(value, p):
        p = jnp.clip(p, 1e-12, 1.0)
        logp_all = jnp.log(p / p.sum(axis=-1, keepdims=True))
        v = value.astype(jnp.int32)
        return jnp.take_along_axis(logp_all, v[..., None], axis=-1)[..., 0]

    @staticmethod
    def sample(key, shape, p):
        logits = jnp.log(jnp.clip(p, 1e-12, 1.0))
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.float32)

    @staticmethod
    def support_point(shape, p):
        return jnp.broadcast_to(jnp.argmax(p, axis=-1).astype(jnp.float32), shape)


# registry keyed by user-facing class name
FAMILIES = {
    "Normal": NormalDist,
    "HalfNormal": HalfNormalDist,
    "Exponential": ExponentialDist,
    "Gamma": GammaDist,
    "LogNormal": LogNormalDist,
    "Uniform": UniformDist,
    "StudentT": StudentTDist,
    "Bernoulli": BernoulliDist,
    "Poisson": PoissonDist,
    "NegativeBinomial": NegativeBinomialDist,
    "Categorical": CategoricalDist,
}
