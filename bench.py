"""Benchmark: the BASELINE.md acceptance matrix, END-TO-END through
``sample()`` (tune + draws, compound step, forest snapshots off-loaded to
host), on real TPU hardware.

Round-2's bench timed only the bare kernel loop of config 1; the round-2
review asked for the full protocol (BASELINE.md "Measurement protocol"):
draws/s/chip, wall-clock to fixed ESS, and a quality metric for EACH of
the 5 configs, through the user entry point.  This bench runs:

  1. friedman      — Gaussian BART, Friedman-5, m=50 (the headline)
  2. bikes         — count data, BART mean + HalfNormal sigma via the
                     compound NUTS step
  3. logistic      — Bernoulli classification (fused logit megakernel)
  4. heterosced    — shape=(2, n) mean+scale forests (separate_trees;
                     fused gauss + het_abs megakernels)
  5. highdim       — p=1000 sparse variable selection (+ split-prior
                     decay); rides the megakernel via the chunked p<=2048 CDF
  6. large_n       — n=50k rows (row-tiled big-n kernel, ops/bign_pallas)

Round-5 protocol hardening (round-4 VERDICT "Next round" #1): the
config-1 headline JSON is printed to stdout IMMEDIATELY after the
friedman rows complete (stdout carries exactly that one line), the full
matrix is rewritten to ``BENCH_FULL.json`` after EVERY config, and a
wall-clock budget (``BENCH_BUDGET_S``, default 1500 s) degrades later
configs to runs=1 — or marks them skipped — instead of letting the
driver's timeout kill the process mid-row (round 4 ended rc=124 with no
parsed headline).

Steady-state rate = (accurate blocked total draw seconds - first chunk)
/ draws after the first chunk; the first draw chunk carries the
draw-program compile.  ESS normalization: ``sec_per_100_ess`` =
wall-clock for the collected draws x 100 / min bulk-ESS over sigma and
three mu rows.  Every config reports split-rank-normalized R-hat
(round-4 VERDICT weak #3: non-convergence must be surfaced, not
buried), and every config uses half-precision draw storage
(``posterior_dtype="float16"``, upcast on return) — the device->host
posterior drain dominates end-to-end rates on this tunneled link
(round-4 VERDICT "Next round" #4).

The CPU denominator is config 1 end-to-end through ``sample()`` on CPU
(single chain, x4 perfect-scaling credit — generous to the reference's
process-per-chain model; CPU PyMC-BART itself cannot run in this image).

Prints ONE JSON line (config-1 headline) on stdout.  The full matrix
goes to ``BENCH_FULL.json`` and per-row summaries to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import warnings

import numpy as np

CPU_CHAINS = 4  # scaling credit assumed for the CPU process-per-chain model

_T0 = time.perf_counter()


def _remaining() -> float:
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    return budget - (time.perf_counter() - _T0)


def _setup_compile_cache():
    """Persistent XLA compilation cache next to the repo.

    The matrix spends ~6-8 min of its budget on compiles (the big-n
    row-ll kernel alone is ~5 min cold); the cache removes them on every
    run after the first on a given machine, letting all nine configs fit
    the budget at full run counts.  Steady-state rates are measured
    after the compile-carrying first chunk either way, so cached vs
    cold only changes wall-clock, never the reported numbers.
    (Verified effective on the axon TPU backend: 3.3 s -> 1.0 s on a
    toy compile.)"""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"# compile cache unavailable: {e}", file=sys.stderr)


# ---------------------------------------------------------------------------
# Data generators
# ---------------------------------------------------------------------------


def friedman(n, p, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, p)).astype(np.float32)
    f = (10 * np.sin(np.pi * X[:, 0] * X[:, 1])
         + 20 * (X[:, 2] - 0.5) ** 2 + 10 * X[:, 3] + 5 * X[:, 4])
    Y = (f + rng.normal(0, 1.0, n)).astype(np.float32)
    return X, Y, f


def bikes_like(n, seed=1):
    """Synthetic hourly rental counts: daily cycle x temperature."""
    rng = np.random.default_rng(seed)
    hour = rng.uniform(0, 24, n)
    temp = rng.uniform(-5, 35, n)
    hum = rng.uniform(20, 100, n)
    wind = rng.uniform(0, 40, n)
    work = rng.integers(0, 2, n).astype(np.float32)
    lam = (60 * np.exp(-0.5 * ((hour - 8) / 2.0) ** 2)
           + 80 * np.exp(-0.5 * ((hour - 17.5) / 2.5) ** 2)
           + 2.0 * np.clip(temp, 0, 30) - 0.3 * (hum - 60) - 0.5 * wind)
    lam = np.maximum(lam, 2.0)
    Y = rng.poisson(lam).astype(np.float32)
    X = np.stack([hour, temp, hum, wind, work], axis=1).astype(np.float32)
    return X, Y, lam


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------


def _steady_rate(timings, chains):
    """Steady-state per-draw wall clock from the ACCURATE blocked total
    (``draw_seconds_total``), minus the first chunk's entry (which
    carries the draw-program compile).  Summing per-chunk entries would
    misattribute overlap-mode drains (round-4 VERDICT weak #8 /
    round-3 ADVICE low)."""
    secs = timings["draw_chunk_seconds"]
    sizes = timings["draw_chunk_sizes"]
    total = timings.get("draw_seconds_total", sum(secs))
    if len(secs) > 1:
        per_draw = (total - secs[0]) / sum(sizes[1:])
    else:
        per_draw = total / sizes[0]
    return chains / per_draw, per_draw


def _ess_block(idata, mu_name, extra_vars=()):
    from pymc_bart_tpu.utils.diagnostics import ess_bulk, rhat

    esses, rhats = {}, {}
    mu = idata.posterior[mu_name].values
    mu = mu.reshape(mu.shape[0], mu.shape[1], -1)  # flatten output dims
    rows = mu.shape[-1]
    for r in (0, rows // 2, rows - 1):
        esses[f"{mu_name}[{r}]"] = float(ess_bulk(mu[..., r]))
        rhats[f"{mu_name}[{r}]"] = float(rhat(mu[..., r]))
    for v in extra_vars:
        if v in idata.posterior:
            esses[v] = float(ess_bulk(idata.posterior[v].values))
            rhats[v] = float(rhat(idata.posterior[v].values))
    return esses, rhats


def run_config(name, model_fn, tune, draws, chains, chunk, quality_fn,
               mu_name="mu", extra_ess=("sigma",), runs=3, **sample_kw):
    """Median-of-``runs`` end-to-end windows (the shared tunnel shows
    ~2x run-to-run swings; round-3 review asked the median protocol
    back).  Repeat runs hit the jit cache, so only the first carries
    compiles; quality/ESS come from the last run's idata."""
    import pymc_bart_tpu as pmb

    # half-precision DRAW STORAGE everywhere (upcast on return): the
    # device->host posterior drain is ~43 KB/draw on friedman and
    # dominates the end-to-end spread on the ~33 MB/s tunneled link
    # (round-4 BENCH_NOTES); quality deltas are < 1e-3 relative
    sample_kw.setdefault("posterior_dtype", "float16")

    rates, per_draws = [], []
    caught = []
    t0 = time.perf_counter()
    for r in range(runs):
        timings: dict = {}
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            with pmb.Model():
                model_fn(pmb)
                idata = pmb.sample(tune=tune, draws=draws, chains=chains,
                                   random_seed=r, chunk_size=chunk,
                                   timings=timings, **sample_kw)
            caught = [str(x.message) for x in w
                      if "per-round sampler path" in str(x.message)]
        rate, per_draw = _steady_rate(timings, chains)
        rates.append(rate)
        per_draws.append(per_draw)
    total = time.perf_counter() - t0
    order = np.argsort(rates)
    mid = order[len(order) // 2]
    rate, per_draw = rates[mid], per_draws[mid]
    esses, rhats = _ess_block(idata, mu_name, extra_ess)
    min_ess = min(esses.values())
    sec_per_100_ess = draws * per_draw * 100.0 / max(min_ess, 1e-9)
    row = {
        "config": name,
        "chains": chains, "tune": tune, "draws": draws,
        "runs": runs,
        "chain_draws_per_s": round(rate, 1),
        "chain_draws_per_s_spread": [round(min(rates), 1),
                                     round(max(rates), 1)],
        "ms_per_draw_all_chains": round(per_draw * 1e3, 3),
        "sec_per_100_ess": round(sec_per_100_ess, 3),
        "min_ess": round(min_ess, 1),
        "ess": {k: round(v, 1) for k, v in esses.items()},
        "max_rhat": round(max(rhats.values()), 3),
        "rhat": {k: round(v, 3) for k, v in rhats.items()},
        "tune_seconds": round(timings["tune_seconds"], 2),
        "total_seconds": round(total, 2),
        "fallback": caught[0] if caught else None,
        "quality": quality_fn(idata),
    }
    return row


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


def config_friedman(n=1000, p=10, m=50, chains=4, tune=200, draws=600,
                    runs=3):
    X, Y, f_true = friedman(n, p)

    def model(pmb):
        mu = pmb.BART("mu", X, Y, m=m)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)

    def quality(idata):
        mu_hat = idata.posterior["mu"].values.mean(axis=(0, 1))
        vi = idata["sample_stats"]["variable_inclusion"].values
        counts = vi.sum(axis=(0, 1))[0].astype(float)
        top5 = set(np.argsort(counts)[::-1][:5].tolist())
        return {
            "rmse_vs_true_f": round(
                float(np.sqrt(np.mean((mu_hat - f_true) ** 2))), 3),
            "sigma_mean": round(
                float(idata.posterior["sigma"].values.mean()), 3),
            "vi_top5_is_signal": top5 == {0, 1, 2, 3, 4},
        }

    # P=20 + 5 refinements: the ESS sweep (scripts/ess_sweep.py,
    # BENCH_NOTES.md) shows min-ESS is FLAT in batch/particles/
    # refinements, but particles+refinements buy FIT quality (rmse 0.59
    # vs 0.90 at P=10/R=0) and the north star requires matched RMSE —
    # so the quality configuration stays
    return run_config("friedman", model, tune, draws, chains, draws // 4,
                      quality, runs=runs, num_particles=20)


def config_bikes(n=1000, m=50, chains=4, tune=200, draws=400, runs=3):
    X, Y, lam = bikes_like(n)

    def model(pmb):
        mu = pmb.BART("mu", X, Y, m=m)
        sigma = pmb.HalfNormal("sigma", 2.0)
        pmb.Normal("y", mu, sigma, observed=Y)

    def quality(idata):
        mu_hat = idata.posterior["mu"].values.mean(axis=(0, 1))
        return {
            "rmse_vs_lambda": round(
                float(np.sqrt(np.mean((mu_hat - lam) ** 2))), 3),
            "rel_rmse": round(float(
                np.sqrt(np.mean((mu_hat - lam) ** 2)) / lam.std()), 3),
        }

    return run_config("bikes", model, tune, draws, chains, draws // 4,
                      quality, runs=runs, num_particles=20)


def config_logistic(n=1000, p=10, m=50, chains=4, tune=200, draws=400,
                    runs=3):
    rng = np.random.default_rng(2)
    X = rng.uniform(size=(n, p)).astype(np.float32)
    logit = 4 * np.sin(np.pi * X[:, 0] * X[:, 1]) + 4 * X[:, 3] - 2
    p_true = 1 / (1 + np.exp(-logit))
    Y = rng.binomial(1, p_true).astype(np.float32)
    bayes = float(np.maximum(p_true, 1 - p_true).mean())

    def model(pmb):
        lo = pmb.BART("lo", X, Y, m=m)
        pmb.Bernoulli("y", p=pmb.math.sigmoid(lo), observed=Y)

    def quality(idata):
        lo_hat = idata.posterior["lo"].values.mean(axis=(0, 1))
        acc = float(((lo_hat > 0) == (Y > 0.5)).mean())
        ph = 1 / (1 + np.exp(-lo_hat))
        ph = np.clip(ph, 1e-6, 1 - 1e-6)
        ll = float(np.mean(Y * np.log(ph) + (1 - Y) * np.log(1 - ph)))
        return {"train_accuracy": round(acc, 3),
                "bayes_accuracy": round(bayes, 3),
                "mean_loglik": round(ll, 3)}

    return run_config("logistic", model, tune, draws, chains, draws // 4,
                      quality, mu_name="lo", extra_ess=(), runs=runs,
                      num_particles=20)


def config_heteroscedastic(n=500, m=30, chains=4, tune=400, draws=400,
                           runs=3):
    # tune=400 + ancestor_sampling: the round-5 het study (BENCH_NOTES)
    # — with the link-aware scale growth target these move
    # scale_hi_over_lo 4.3 -> 7.0 at ~2% time cost on this small row
    rng = np.random.default_rng(3)
    X = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    mu_true = 3 * np.sin(2 * X[:, 0])
    sd_true = 0.2 + 1.5 * (X[:, 1] > 0)
    Y = rng.normal(mu_true, sd_true).astype(np.float32)

    def model(pmb):
        w = pmb.BART("w", X, Y, m=m, shape=(2, n), separate_trees=True)
        pmb.Normal("y", w[0], pmb.math.abs(w[1]) + 0.05, observed=Y)

    def quality(idata):
        w_post = idata.posterior["w"].values.mean(axis=(0, 1))
        corr = float(np.corrcoef(w_post[0], mu_true)[0, 1])
        # scale estimate = E|w1| over DRAWS (|posterior mean| collapses
        # rows whose scale output sign-mixes and biased the round-4
        # ratio low — round-5 investigation, BENCH_NOTES)
        s_hat = np.abs(idata.posterior["w"].values[:, :, 1, :]
                       ).mean(axis=(0, 1)) + 0.05
        hi = float(s_hat[X[:, 1] > 0].mean())
        lo = float(s_hat[X[:, 1] <= 0].mean())
        # s_hat targets sigma(x) = |w1| + 0.05 directly, so the target
        # ratio is sd_true hi/lo = 1.7 / 0.2 = 8.5
        return {"corr_mean_output": round(corr, 3),
                "scale_hi_over_lo": round(hi / max(lo, 1e-9), 2),
                "true_ratio": 8.5}

    return run_config("heteroscedastic", model, tune, draws, chains,
                      draws // 4, quality, mu_name="w", extra_ess=(),
                      runs=runs, ancestor_sampling=True)


def config_highdim(n=200, p=1000, m=50, chains=4, tune=200, draws=400,
                   runs=3):
    # budget raised from 2x100 draws once the chunked-CDF megakernel took
    # this config from 64.9 to ~500 chain-draws/s, so the signal-mass
    # quality claim rests on real effective samples
    rng = np.random.default_rng(4)
    X = rng.normal(size=(n, p)).astype(np.float32)
    Y = (3 * X[:, 0] + 2 * X[:, 1] - 2 * X[:, 2]
         + rng.normal(0, 0.5, n)).astype(np.float32)

    def model(pmb):
        mu = pmb.BART("mu", X, Y, m=m, split_prior=np.ones(p))
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)

    def quality(idata):
        vi = idata["sample_stats"]["variable_inclusion"].values
        counts = vi.sum(axis=(0, 1))[0].astype(float)
        order = np.argsort(counts)[::-1]
        mass = float(counts[:3].sum() / counts.sum())
        return {"vi_top3_is_signal": set(order[:3].tolist()) == {0, 1, 2},
                "signal_mass": round(mass, 3)}

    return run_config("highdim_p1000", model, tune, draws, chains,
                      max(draws // 4, 1), quality, runs=runs,
                      num_particles=40, batch=(0.5, 0.5),
                      split_prior_decay=0.999)


def config_large_n(n=50_000, p=10, m=20, chains=4, tune=200, draws=600,
                   runs=1):
    # rides the row-tiled big-n kernel (sufficient-statistics PGBART).
    # chains raised 2 -> 4 and draws 400 -> 600 (round-4 VERDICT weak #4
    # / "Next round" #7a: the rmse claim needs real effective samples;
    # chain counts above the single-instance VMEM ceiling run as
    # sequential per-chain kernel calls)
    X, Y, f_true = friedman(n, p, seed=5)

    def model(pmb):
        mu = pmb.BART("mu", X, Y, m=m)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)

    def quality(idata):
        mu_hat = idata.posterior["mu"].values.mean(axis=(0, 1))
        return {"rmse_vs_true_f": round(
            float(np.sqrt(np.mean((mu_hat - f_true) ** 2))), 3)}

    # ancestor_sampling: at this shape the rejuvenation pass hides
    # entirely under the posterior drain (measured 170 vs 171 s for the
    # whole window) while cutting rmse 0.70 -> 0.42 and the sigma bias
    # 1.45 -> 1.27 (BENCH_NOTES round-5)
    return run_config("large_n_50k", model, tune, draws, chains,
                      max(draws // 4, 1), quality, runs=runs,
                      num_particles=10, num_refinements=0,
                      store_trees=False, ancestor_sampling=True)


def config_large_n_logistic(n=50_000, p=10, m=20, chains=4, tune=200,
                            draws=600, runs=1):
    # large-n CLASSIFICATION: rides the big-n kernel's row-ll regime
    # (round-4 VERDICT "Next round" #5 — this shape previously fell to
    # the XLA path at ~9 chain-draws/s with zero bench visibility).
    # num_refinements=0 is the row-ll gate's requirement.
    rng = np.random.default_rng(7)
    X = rng.uniform(size=(n, p)).astype(np.float32)
    logit = 4 * np.sin(np.pi * X[:, 0] * X[:, 1]) + 4 * X[:, 3] - 2
    p_true = 1 / (1 + np.exp(-logit))
    Y = rng.binomial(1, p_true).astype(np.float32)
    bayes = float(np.maximum(p_true, 1 - p_true).mean())

    def model(pmb):
        lo = pmb.BART("lo", X, Y, m=m)
        pmb.Bernoulli("y", p=pmb.math.sigmoid(lo), observed=Y)

    def quality(idata):
        lo_hat = idata.posterior["lo"].values.mean(axis=(0, 1))
        acc = float(((lo_hat > 0) == (Y > 0.5)).mean())
        return {"train_accuracy": round(acc, 3),
                "bayes_accuracy": round(bayes, 3)}

    return run_config("large_n_logistic_50k", model, tune, draws, chains,
                      max(draws // 4, 1), quality, mu_name="lo",
                      extra_ess=(), runs=runs, num_particles=10,
                      num_refinements=0, store_trees=False,
                      ancestor_sampling=True)


def config_friedman_linear(n=1000, p=10, m=50, chains=4, tune=200,
                           draws=400, runs=1):
    # response="linear" rides the round-5 per-round Pallas path (the
    # grow kernel's least-squares slope statistics; round-4 VERDICT
    # "Next round" #6 — this response previously ran XLA-only at ~12
    # draws/s/chain, unmeasured on TPU; the kernel runs 19x faster)
    X, Y, f_true = friedman(n, p, seed=6)

    def model(pmb):
        mu = pmb.BART("mu", X, Y, m=m, response="linear")
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)

    def quality(idata):
        mu_hat = idata.posterior["mu"].values.mean(axis=(0, 1))
        return {"rmse_vs_true_f": round(
            float(np.sqrt(np.mean((mu_hat - f_true) ** 2))), 3),
            "sigma_mean": round(
                float(idata.posterior["sigma"].values.mean()), 3)}

    return run_config("friedman_linear", model, tune, draws, chains,
                      max(draws // 4, 1), quality, runs=runs,
                      num_particles=20)


def config_het_joint(n=500, m=30, chains=4, tune=200, draws=400, runs=1):
    # JOINT (shared-structure) multi-output trees — one forest, k=2 leaf
    # values per node, mean + scale (reference CHANGELOG.md:385 default
    # when separate_trees=False; round-4 VERDICT "Next round" #9).
    # Rides the per-round Pallas growth kernel (k-generic) with the
    # generic XLA model likelihood.
    rng = np.random.default_rng(3)
    X = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    mu_true = 3 * np.sin(2 * X[:, 0])
    sd_true = 0.2 + 1.5 * (X[:, 1] > 0)
    Y = rng.normal(mu_true, sd_true).astype(np.float32)

    def model(pmb):
        w = pmb.BART("w", X, Y, m=m, shape=(2, n))
        pmb.Normal("y", w[0], pmb.math.abs(w[1]) + 0.05, observed=Y)

    def quality(idata):
        w_post = idata.posterior["w"].values.mean(axis=(0, 1))
        corr = float(np.corrcoef(w_post[0], mu_true)[0, 1])
        s_hat = np.abs(idata.posterior["w"].values[:, :, 1, :]
                       ).mean(axis=(0, 1)) + 0.05
        hi = float(s_hat[X[:, 1] > 0].mean())
        lo = float(s_hat[X[:, 1] <= 0].mean())
        return {"corr_mean_output": round(corr, 3),
                "scale_hi_over_lo": round(hi / max(lo, 1e-9), 2),
                "true_ratio": 8.5}

    return run_config("het_joint_trees", model, tune, draws, chains,
                      draws // 4, quality, mu_name="w", extra_ess=(),
                      runs=runs)


# configs in execution order with their max run counts (large-n rows are
# single-run: their windows are long and their spread is drain-bound)
CONFIGS = [
    (config_friedman, 3),
    (config_bikes, 3),
    (config_logistic, 3),
    (config_heteroscedastic, 3),
    (config_highdim, 3),
    (config_large_n, 1),
    (config_large_n_logistic, 1),
    (config_friedman_linear, 1),
    (config_het_joint, 1),
]


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------


def main():
    if os.environ.get("_BENCH_CHILD") == "cpu":
        # CPU denominator: config-1 end-to-end, single chain
        import jax

        jax.config.update("jax_platforms", "cpu")
        _setup_compile_cache()
        row = config_friedman(chains=1, tune=100, draws=200, runs=1)
        # the CPU denominator carries its OWN ESS block so BASELINE.md's
        # "wall-clock to fixed ESS" comparison is explicit, not assumed
        # (same engine + same algorithm on both sides)
        print(json.dumps({"cpu_chain_draws_per_s": row["chain_draws_per_s"],
                          "cpu_min_ess": row["min_ess"],
                          "cpu_sec_per_100_ess": row["sec_per_100_ess"],
                          "cpu_ess": row["ess"]}))
        return

    only = os.environ.get("BENCH_ONLY")  # dev aid: comma-sep config names
    env = dict(os.environ, _BENCH_CHILD="cpu")
    if only:
        cpu_rate = None
        cpu_row = {}
    else:
      try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=900,
        )
        cpu_line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
        cpu_row = json.loads(cpu_line)
        cpu_rate = cpu_row["cpu_chain_draws_per_s"]
      except Exception as e:  # noqa: BLE001
        print(f"# cpu baseline failed: {e}", file=sys.stderr)
        cpu_rate = None
        cpu_row = {}

    import jax

    _setup_compile_cache()
    platform = jax.devices()[0].platform
    rows = []
    headline_done = False

    def result_dict():
        return {
            "protocol": "end-to-end sample(): steady-state chain-draws/s "
                        "after the first (compile-carrying) draw chunk; "
                        "denominator = same engine, config-1 CPU sample() "
                        f"x{CPU_CHAINS} perfect-scaling credit "
                        f"({cpu_rate} chain-draws/s measured)",
            "cpu_chain_draws_per_s": cpu_rate,
            "cpu_min_ess": cpu_row.get("cpu_min_ess"),
            "cpu_sec_per_100_ess": cpu_row.get("cpu_sec_per_100_ess"),
            "cpu_ess": cpu_row.get("cpu_ess"),
            "configs": rows,
        }

    def emit(row):
        rows.append(row)
        print(f"# {json.dumps(row)}", file=sys.stderr, flush=True)
        if not only:  # a filtered dev run must not clobber the full matrix
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_FULL.json")
            with open(path, "w") as fh:
                json.dump(result_dict(), fh, indent=1)

    def emit_headline(c1):
        # the ONE stdout JSON line, printed as soon as config 1 lands so
        # a later driver timeout cannot erase the headline (round-4
        # BENCH_r04.json was rc=124 / parsed null)
        vs = (c1.get("chain_draws_per_s", 0.0) / (cpu_rate * CPU_CHAINS)
              if cpu_rate else 1.0)
        print(json.dumps({
            "metric": "friedman_m50_n1000 end-to-end chain-draws/s/chip "
                      f"({platform}, 4 chains, sample() incl. compound "
                      "NUTS + tree storage)",
            "value": c1.get("chain_draws_per_s", 0.0),
            "unit": "draws/s",
            "vs_baseline": round(vs, 3),
        }), flush=True)

    for fn, max_runs in CONFIGS:
        name = fn.__name__.replace("config_", "")
        if only and name not in only.split(","):
            continue
        rem = _remaining()
        if rows and rem < 120:
            emit({"config": name,
                  "skipped": f"budget exhausted ({rem:.0f}s left; "
                             "raise BENCH_BUDGET_S)"})
            continue
        runs = max_runs if rem > 420 else 1
        try:
            row = fn(runs=runs)
        except Exception as e:  # noqa: BLE001
            row = {"config": name, "error": repr(e)[:500]}
        emit(row)
        if not headline_done:
            emit_headline(row)
            headline_done = True

    if not headline_done:  # nothing ran (bad BENCH_ONLY filter)
        emit_headline({})


if __name__ == "__main__":
    main()
