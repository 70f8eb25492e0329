"""Benchmark: effective samples/s/chip on 3-D checkerboard tomography
(BASELINE.json's north-star metric; SURVEY.md §6; VERDICT r1 #1).

Runs the config-2-shaped workload (64^3 checkerboard, inv 12^3, 8 src,
12 rec) with BOTH the adaptive-Metropolis and the NUTS (gradient/adjoint)
kernels and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline value is AM's ESS(logpost)/s — the best measured effective
throughput on this workload (the gradient samplers' profiled economics are
recorded in BASELINE.md 2026-08-19: one swept-adjoint gradient costs
~1.75x a forward likelihood, so a depth-4 NUTS step costs ~26x an AM step
and does not pay for itself at inv=12^3). Per-cell slowness ESS and the
NUTS numbers ride in "extra" (ESS of the scalar logpost alone flatters
mixing — VERDICT r1 weak #6). There are no published reference numbers
(reference mount empty, see BASELINE.md); ``vs_baseline`` tracks our own
round-1 headline so the driver sees round-over-round movement.

Budgets are sized so the whole script stays under ~5 min on the v5-lite
chip (the careful long-window measurements live in
tools/gradient_sampler_bench.py and BASELINE.md).
"""

import json
import time

import jax
import numpy as np

# Round-1 recorded effective-samples/s on this workload (BASELINE.md
# 2026-08-19: 79.7 chain-steps/s -> 1.66 eff-samples/s at 16 chains;
# VERDICT r1 quotes 1.70). Locked as the like-for-like baseline for the
# new ESS/s headline (same 16-chain workload).
BASELINE_EFF_PER_S = 1.70
# Round-1 steps/s baselines, kept for continuity in "extra".
BASELINE_STEPS = 48.364


def main():
    from mceik_tpu.config import DataCfg, EikonalCfg, ModelCfg
    from mceik_tpu.datasets import make_dataset
    from mceik_tpu.diag.ess import ess, ess_per_param
    from mceik_tpu.diag.moments import welford_merge_chains
    from mceik_tpu.grid import Grid
    from mceik_tpu.model.posterior import build_posterior
    from mceik_tpu.samplers import am, hmc, nuts
    from mceik_tpu.samplers.base import init_chain_states, run_mcmc

    n = 64
    grid = Grid(shape=(n, n, n), spacing=(1.0, 1.0, 1.0))
    mcfg = ModelCfg(mode="tomo", inv_shape=(12, 12, 12), prior_sigma_u=0.2,
                    sigma=0.01)
    dcfg = DataCfg(dataset="checkerboard3d", n_src=8, n_rec=12, noise=0.01,
                   checker_cells=(3, 3, 3), checker_amplitude=0.1)
    ecfg = EikonalCfg(method="sweep", tol=1e-3, max_iters=20, n_inner=4)

    data, _ = make_dataset(grid, dcfg, mcfg)
    posterior = build_posterior(mcfg, data, grid, ecfg)

    # 16 chains/chip is the measured throughput sweet spot at this shape
    # (8: 66.6, 16: 79.7, 32: 76.9 steps/s — BASELINE.md 2026-08-19).
    n_chains = 16
    states = init_chain_states(posterior.logpost, posterior.init_params,
                               jax.random.PRNGKey(0), n_chains)
    example = posterior.init_params(jax.random.PRNGKey(1))
    hyper = am.init_hyper(posterior.prior_scales, 0.05, example)
    kernel = am.make_kernel(posterior.logpost)
    adapter = am.make_adapter()

    # --- AM: warm up adaptation + compile, then timed steady state -------
    r0 = run_mcmc(kernel, adapter, states, hyper, jax.random.PRNGKey(2),
                  n_warmup=50, n_steps=1)
    jax.block_until_ready(r0.logpost_trace)

    n_steps = 150
    t0 = time.perf_counter()
    r = run_mcmc(kernel, None, r0.states, r0.hyper, jax.random.PRNGKey(3),
                 n_warmup=0, n_steps=n_steps, collect_fn=lambda p: p.u)
    jax.block_until_ready(r.logpost_trace)
    wall_am = time.perf_counter() - t0

    steps_s_am = n_steps * n_chains / wall_am
    lp = np.asarray(r.logpost_trace)
    ess_lp_am = ess(lp)
    cell_am = ess_per_param(np.asarray(jax.device_get(r.samples)))
    eff_am = ess_lp_am / wall_am

    # --- NUTS: AM-primed diag mass, short steady-state window ------------
    # (gradient path: implicit-adjoint swept transport; BASELINE.md r2.)
    post_g = build_posterior(mcfg, data, grid, ecfg, differentiable=True)
    # run_mcmc's welford is PER-CHAIN (count (C,), m2 leaves (C, ...)); the
    # NUTS mass priming needs the POOLED accumulator (scalar count) — both
    # for the variance broadcast here and because hmc's warmup adapter
    # merges chain batches into it (VERDICT r2 missing #1).
    w = welford_merge_chains(r.welford)
    cnt = np.maximum(float(w.count), 2.0)
    var = jax.tree.map(
        lambda m2, s: (jax.numpy.maximum(
            jax.numpy.asarray(m2) / (cnt - 1.0), 1e-8 * s * s)
            .astype(jax.numpy.float32)) if s is not None else None,
        w.m2, posterior.prior_scales)
    gstates = init_chain_states(post_g.logpost, post_g.init_params,
                                jax.random.PRNGKey(4), n_chains)
    ghyper = hmc.init_hyper(post_g.prior_scales, 0.005, example)
    # Prime BOTH the mass and the welford: the warmup adapter recomputes
    # inv_mass from its welford each step, so a primed welford (count >
    # mass_start) is what makes the AM-estimated variances stick.
    ghyper = ghyper.replace(inv_mass=var, welford=w)
    gkernel = nuts.make_kernel(post_g.logpost, max_tree_depth=4)
    g0 = run_mcmc(gkernel, hmc.make_adapter(0.8), gstates, ghyper,
                  jax.random.PRNGKey(5), n_warmup=6, n_steps=1)
    jax.block_until_ready(g0.logpost_trace)
    ghyper = hmc.finalize(g0.hyper)

    n_gsteps = 10
    t0 = time.perf_counter()
    g = run_mcmc(gkernel, None, g0.states, ghyper, jax.random.PRNGKey(6),
                 n_warmup=0, n_steps=n_gsteps, collect_fn=lambda p: p.u)
    jax.block_until_ready(g.logpost_trace)
    wall_g = time.perf_counter() - t0
    glp = np.asarray(g.logpost_trace)
    eff_nuts = ess(glp) / wall_g
    cell_nuts = ess_per_param(np.asarray(jax.device_get(g.samples)))
    steps_s_nuts = n_gsteps * n_chains / wall_g

    value = eff_am
    vs = value / BASELINE_EFF_PER_S
    print(json.dumps({
        "metric": "eff_samples_per_s_chip_3d_checkerboard64",
        "value": round(value, 4),
        "unit": "ESS(logpost)/s",
        "vs_baseline": round(vs, 3),
        "extra": {
            "am_chain_steps_per_s": round(steps_s_am, 3),
            "am_vs_r1_steps_baseline": round(steps_s_am / BASELINE_STEPS, 3),
            "am_ess_cell_min_per_s": round(float(cell_am.min()) / wall_am, 4),
            "am_ess_cell_med_per_s": round(float(np.median(cell_am)) / wall_am, 4),
            "nuts_eff_samples_per_s": round(eff_nuts, 4),
            "nuts_chain_steps_per_s": round(steps_s_nuts, 3),
            "nuts_ess_cell_min_per_s": round(float(cell_nuts.min()) / wall_g, 4),
            "nuts_ess_cell_med_per_s": round(float(np.median(cell_nuts)) / wall_g, 4),
            "wall_s_am": round(wall_am, 3),
            "wall_s_nuts": round(wall_g, 3),
            "n_chains": n_chains,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
