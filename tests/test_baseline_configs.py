"""Acceptance-config tests from BASELINE.md (small-budget versions):

2. count model: BART mean + HalfNormal sigma (compound HMC step)
4. multi-output heteroscedastic BART, shape=(2, n) for mu and log-sigma
5. high-dim variable selection: sparse signal in p=1000 covariates with
   split_prior, PDP/ICE machinery

(Config 1 Friedman is bench.py; config 3 Bernoulli classification is
covered here too.)
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import pymc_bart_tpu as pmb


def test_count_model_compound_step():
    # bikes-like: count response, BART mean, HalfNormal sigma
    rng = np.random.default_rng(0)
    n = 120
    X = rng.uniform(0, 1, size=(n, 4))
    lam = 5 + 10 * np.sin(np.pi * X[:, 0])
    Y = rng.poisson(lam).astype(float)

    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=20)
        sigma = pmb.HalfNormal("sigma", 5.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=100, draws=100, chains=1, random_seed=1)

    fhat = idata.posterior["mu"].values.mean(axis=(0, 1))
    # correlation with the true rate should be strong
    r = np.corrcoef(fhat, lam)[0, 1]
    assert r > 0.7, r
    assert (idata.posterior["sigma"].values > 0).all()


def test_bernoulli_classification():
    # BASELINE config 3: logistic-link binary outcome
    rng = np.random.default_rng(1)
    n = 150
    X = rng.normal(size=(n, 3))
    p_true = 1 / (1 + np.exp(-2.5 * X[:, 0]))
    Y = rng.binomial(1, p_true).astype(float)

    with pmb.Model():
        lo = pmb.BART("lo", X, Y, m=20)
        pmb.Bernoulli("y", p=pmb.math.sigmoid(lo), observed=Y)
        idata = pmb.sample(tune=120, draws=120, chains=1, random_seed=2)

    lo_hat = idata.posterior["lo"].values.mean(axis=(0, 1))
    acc = ((lo_hat > 0) == (Y > 0.5)).mean()
    # Bayes accuracy for this noise level is ~0.86; require most of it
    assert acc > 0.75, acc
    assert np.corrcoef(lo_hat, X[:, 0])[0, 1] > 0.6


@pytest.mark.slow
def test_heteroscedastic_two_output():
    # BASELINE config 4: shape=(2, n), mu = w[0], sigma = softplus-ish
    rng = np.random.default_rng(2)
    n = 150
    X = rng.uniform(-1, 1, size=(n, 2))
    mu_true = np.where(X[:, 0] > 0, 3.0, -3.0)
    sd_true = np.where(X[:, 1] > 0, 2.0, 0.3)
    Y = rng.normal(mu_true, sd_true)

    with pmb.Model():
        w = pmb.BART("w", X, Y, m=20, shape=(2, n))
        pmb.Normal("y", w[0], pmb.math.abs(w[1]) + 0.05, observed=Y)
        idata = pmb.sample(tune=150, draws=150, chains=1, random_seed=3)

    w_post = idata.posterior["w"].values.mean(axis=(0, 1))  # (2, n)
    # the mean output must track the true mean
    r = np.corrcoef(w_post[0], mu_true)[0, 1]
    assert r > 0.8, r


@pytest.mark.slow
def test_heteroscedastic_separate_trees():
    # separate tree structures per output (reference CHANGELOG.md:385):
    # each output trains its OWN forest; the mean output must track the
    # mean signal AND the scale output must track the scale signal
    rng = np.random.default_rng(12)
    n = 150
    X = rng.uniform(-1, 1, size=(n, 2))
    mu_true = np.where(X[:, 0] > 0, 3.0, -3.0)
    sd_true = np.where(X[:, 1] > 0, 2.0, 0.3)
    Y = rng.normal(mu_true, sd_true)

    with pmb.Model():
        w = pmb.BART("w", X, Y, m=20, shape=(2, n), separate_trees=True)
        pmb.Normal("y", w[0], pmb.math.abs(w[1]) + 0.05, observed=Y)
        idata = pmb.sample(tune=200, draws=150, chains=1, random_seed=3)

    w_post = idata.posterior["w"].values.mean(axis=(0, 1))  # (2, n)
    r_mu = np.corrcoef(w_post[0], mu_true)[0, 1]
    assert r_mu > 0.8, r_mu
    # the scale output: |w1| must be larger where the true sd is larger
    scale_hat = np.abs(w_post[1])
    hi, lo = scale_hat[X[:, 1] > 0].mean(), scale_hat[X[:, 1] <= 0].mean()
    assert hi > 1.3 * lo, (hi, lo)

    # separate-trees posterior store: one forest per output, and the
    # interpretability layer runs through the list layout
    from pymc_bart_tpu.utils.posterior import sample_posterior

    model_w = w
    assert isinstance(model_w.all_trees, list) and len(model_w.all_trees) == 2
    preds = sample_posterior(model_w.all_trees, X, size=4)
    assert preds.shape == (4, n, 2)


@pytest.mark.slow
def test_highdim_variable_selection():
    # BASELINE config 5: p=1000 sparse X; signal on first 3 covariates
    rng = np.random.default_rng(3)
    n, p = 120, 1000
    X = rng.normal(size=(n, p))
    Y = 3 * X[:, 0] + 2 * X[:, 1] - 2 * X[:, 2] + rng.normal(0, 0.5, n)

    split_prior = np.ones(p)

    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=50, split_prior=split_prior)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=300, draws=100, chains=2, random_seed=4,
                           num_particles=40, batch=(0.5, 0.5),
                           split_prior_decay=0.999)

    # Dirichlet-style split-prior adaptation recovers the three signal
    # covariates as the TOP-3 by inclusion at p=1000.  The linear
    # reference accumulation plateaus at ~0.4 combined mass at this
    # budget (the p=1000 uniform initial mass dilutes the counts);
    # exponential forgetting (split_prior_decay=0.999) washes the base
    # out and reaches 0.69 measured — the bar matches the reference-
    # class > 50% oracle (reference tests/test_bart.py:44-64).
    vi = idata["sample_stats"]["variable_inclusion"].values.sum(axis=(0, 1))[0]
    order = np.argsort(vi)[::-1]
    assert set(order[:3]) == {0, 1, 2}, (order[:10].tolist(), vi[:5])
    mass = vi[:3].sum() / vi.sum()
    assert mass > 0.5, mass
    # interpretability machinery runs at p=1000 (restricted var set)
    pmb.plot_pdp(mu, X=X, Y=Y, var_idx=[0, 1, 2], samples=10)


def test_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(4)
    X = rng.normal(size=(40, 2))
    Y = rng.normal(size=40)

    ckdir = str(tmp_path / "ck")

    def build():
        with pmb.Model() as model:
            mu = pmb.BART("mu", X, Y, m=5)
            sigma = pmb.HalfNormal("sigma", 1.0)
            pmb.Normal("y", mu, sigma, observed=Y)
            return model

    model = build()
    idata = pmb.sample(tune=10, draws=10, chains=1, random_seed=5,
                       model=model, chunk_size=10, checkpoint_dir=ckdir)
    from pymc_bart_tpu.utils import checkpoint as ck
    found = ck.latest_checkpoint(ckdir)
    assert found is not None
    assert found[1] == 20  # tune + draws steps recorded
    # resume: ask for more draws; the tuned state is restored, only the
    # remaining draws run, and the draws already collected before the
    # interruption are reloaded — the result is the FULL posterior
    model2 = build()
    idata2 = pmb.sample(tune=10, draws=20, chains=1, random_seed=5,
                        model=model2, chunk_size=10, checkpoint_dir=ckdir,
                        resume=True)
    assert idata2.posterior["mu"].shape == (1, 20, 40)
    # the first 10 draws are the original run's draws, bit-for-bit
    np.testing.assert_array_equal(np.asarray(idata2.posterior["mu"])[:, :10],
                                  np.asarray(idata.posterior["mu"]))


@pytest.mark.slow
def test_sigma_posterior_coverage():
    """Statistical-parity check (VERDICT round 1, #2): the compound
    NUTS sigma posterior on Friedman data concentrates near the true
    noise scale — an over-fitting tree sampler absorbs noise into the
    trees and biases sigma LOW, so this guards the prior/shrinkage
    calibration end to end."""
    rng = np.random.default_rng(7)
    n, sigma_true = 400, 1.0
    X = rng.uniform(size=(n, 5))
    f = (10 * np.sin(np.pi * X[:, 0] * X[:, 1]) + 20 * (X[:, 2] - 0.5) ** 2
         + 10 * X[:, 3] + 5 * X[:, 4])
    Y = f + rng.normal(0, sigma_true, n)

    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=50)
        sigma = pmb.HalfNormal("sigma", 2.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=300, draws=300, chains=2, random_seed=11)

    s_draws = np.asarray(idata.posterior["sigma"].values).ravel()
    s_mean = float(s_draws.mean())
    lo, hi = np.quantile(s_draws, [0.02, 0.98])
    # the dangerous failure mode is sigma collapsing BELOW the truth
    # (trees absorbing noise); the benign direction is a mild upward
    # bias from residual tree misfit at this budget (~1.2 measured,
    # consistent with RMSE(f_hat, f) ~ 0.7: sqrt(1 + 0.7^2) = 1.22)
    assert lo > 0.85 * sigma_true, (lo, "sigma collapsed low: overfit")
    assert 0.95 < s_mean < 1.35, s_mean
    assert hi < 1.5 * sigma_true, hi


def test_checkpoint_resume_uneven_chunks(tmp_path):
    """Resume reproducibility with chunk sizes that do NOT divide the
    draw count: checkpoint mode runs even chunks, so the saved carry
    never runs ahead of the recorded step (round-3 ADVICE: an over-run
    final chunk made larger-draws resumes replay consumed key indices).
    A resumed longer run must equal an uninterrupted run bit-for-bit."""
    rng = np.random.default_rng(9)
    X = rng.normal(size=(40, 2))
    Y = rng.normal(size=40)

    def build():
        with pmb.Model() as model:
            mu = pmb.BART("mu", X, Y, m=5)
            sigma = pmb.HalfNormal("sigma", 1.0)
            pmb.Normal("y", mu, sigma, observed=Y)
            return model

    # interrupted run: 11 draws in chunks of <=4 (even chunks: 4,4,3)
    ck1 = str(tmp_path / "ck1")
    pmb.sample(tune=8, draws=11, chains=1, random_seed=5, model=build(),
               chunk_size=4, checkpoint_dir=ck1)
    resumed = pmb.sample(tune=8, draws=21, chains=1, random_seed=5,
                         model=build(), chunk_size=4, checkpoint_dir=ck1,
                         resume=True)
    # uninterrupted 21-draw run (fresh checkpoint dir)
    ck2 = str(tmp_path / "ck2")
    full = pmb.sample(tune=8, draws=21, chains=1, random_seed=5,
                      model=build(), chunk_size=4, checkpoint_dir=ck2)
    np.testing.assert_array_equal(np.asarray(resumed.posterior["mu"]),
                                  np.asarray(full.posterior["mu"]))
    np.testing.assert_array_equal(np.asarray(resumed.posterior["sigma"]),
                                  np.asarray(full.posterior["sigma"]))
