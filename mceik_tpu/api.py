"""Top-level API (SURVEY.md §1 L7, §3.1): ``run(config) -> RunSummary``.

Wires: config -> grid -> synthetic/loaded data -> posterior -> sampler
dispatch -> jitted scan(vmap(kernel)) -> pooled moments + diagnostics.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mceik_tpu.config import RunConfig
from mceik_tpu.datasets import make_dataset
from mceik_tpu.diag.ess import ess, split_rhat
from mceik_tpu.diag.moments import welford_finalize, welford_merge_chains
from mceik_tpu.dist.mesh import chain_mesh, init_distributed, shard_chains
from mceik_tpu.eikonal.solve import EikonalConfig
from mceik_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from mceik_tpu.model.posterior import build_posterior
from mceik_tpu.samplers import am, hmc, rwm
from mceik_tpu.samplers.base import MCMCResult, init_chain_states, run_mcmc


@dataclasses.dataclass
class RunSummary:
    """Host-side results: pooled posterior moments + diagnostics."""

    config: RunConfig
    result: MCMCResult               # device pytrees (states, welford, samples)
    post_mean: Dict[str, Any]        # pooled posterior means of tracked fields
    post_var: Dict[str, Any]
    accept_rate: float
    rhat_max: float                  # max split-Rhat over collected u (or hypo)
    ess_logpost: float
    wall_time_s: float
    samples_per_sec: float           # raw chain-steps/s (all chains)
    eff_samples_per_sec: float       # ESS(logpost)/s
    truth: Dict[str, Any]
    recovery_corr: Optional[float]   # corr(posterior mean slowness, truth)


def _dispatch_sampler(scfg, posterior):
    scales = posterior.prior_scales
    example = posterior.init_params(jax.random.PRNGKey(0))
    if scfg.algorithm == "rwm":
        return (rwm.make_kernel(posterior.logpost), rwm.make_adapter(scfg.target_accept),
                rwm.init_hyper(scales, scfg.step_size), None)
    if scfg.algorithm == "am":
        return (am.make_kernel(posterior.logpost), am.make_adapter(scfg.target_accept),
                am.init_hyper(scales, scfg.step_size, example), None)
    if scfg.algorithm == "hmc":
        target = max(scfg.target_accept, 0.7)
        return (hmc.make_kernel(posterior.logpost, scfg.n_leapfrog),
                hmc.make_adapter(target),
                hmc.init_hyper(scales, scfg.step_size, example), hmc.finalize)
    if scfg.algorithm == "nuts":
        from mceik_tpu.samplers import nuts
        target = max(scfg.target_accept, 0.8)
        return (nuts.make_kernel(posterior.logpost, scfg.max_tree_depth),
                hmc.make_adapter(target),
                hmc.init_hyper(scales, scfg.step_size, example), hmc.finalize)
    raise ValueError(f"unknown/unsupported algorithm {scfg.algorithm!r} "
                     "(smc has its own entry point: samplers.smc.run_smc)")


def run(config: RunConfig, verbose: bool = True) -> RunSummary:
    init_distributed(config.dist)
    grid = config.grid.build()
    eik = EikonalConfig(method=config.eikonal.method, tol=config.eikonal.tol,
                        max_iters=config.eikonal.max_iters,
                        n_inner=config.eikonal.n_inner,
                        seed_radius=config.eikonal.seed_radius,
                        use_pallas=config.eikonal.use_pallas)
    data, truth = make_dataset(grid, config.data, config.model, eik)

    differentiable = config.sampler.algorithm in ("hmc", "nuts")
    posterior = build_posterior(config.model, data, grid, config.eikonal,
                                differentiable=differentiable)

    kernel, adapter, hyper, finalize_fn = _dispatch_sampler(config.sampler, posterior)

    scfg = config.sampler
    key = jax.random.PRNGKey(scfg.seed)
    k_init, k_run = jax.random.split(key)

    states = init_chain_states(posterior.logpost, posterior.init_params,
                               k_init, scfg.n_chains)

    # Shard chains across devices when possible (single-device: no-op mesh).
    mesh = chain_mesh(config.dist)
    n_dev = mesh.devices.size
    if n_dev > 1 and scfg.n_chains % n_dev == 0:
        states = shard_chains(states, mesh, config.dist.chain_axis)

    if config.io.resume:
        (states, hyper), meta = load_checkpoint(config.io.resume, (states, hyper))
        if verbose:
            print(f"[mceik-tpu] resumed from {config.io.resume} (meta={meta})")

    track_slowness = config.model.mode in ("tomo", "joint")

    def track_fn(params):
        out = {"params": params}
        if track_slowness:
            out["slowness"] = posterior.slowness_of(params)
        return out

    collect_fn = lambda params: params

    t0 = time.perf_counter()
    result = run_mcmc(kernel, adapter, states, hyper, k_run,
                      n_warmup=scfg.n_warmup, n_steps=scfg.n_samples,
                      thin=scfg.thin, track_fn=track_fn,
                      collect_fn=collect_fn, finalize_fn=finalize_fn)
    jax.block_until_ready(result.logpost_trace)
    wall = time.perf_counter() - t0

    if config.io.checkpoint_path:
        save_checkpoint(config.io.checkpoint_path, (result.states, result.hyper),
                        meta={"n_steps": int(scfg.n_samples),
                              "algorithm": scfg.algorithm})

    # --- host-side summary ---------------------------------------------
    pooled = welford_merge_chains(result.welford)
    mean, var = welford_finalize(pooled)
    post_mean = jax.tree.map(np.asarray, mean)
    post_var = jax.tree.map(np.asarray, var)

    accept = float(np.mean(np.asarray(result.accept_trace)))
    lp_trace = np.asarray(result.logpost_trace)
    ess_lp = ess(lp_trace)

    # R-hat on the most informative collected block.
    samples = result.samples
    probe = None
    if getattr(samples, "u", None) is not None:
        probe = np.asarray(samples.u).reshape(lp_trace.shape[0], lp_trace.shape[1], -1)
    elif getattr(samples, "hypo_raw", None) is not None:
        probe = np.asarray(samples.hypo_raw).reshape(lp_trace.shape[0], lp_trace.shape[1], -1)
    rhat_max = float(np.nanmax(split_rhat(probe))) if probe is not None else float("nan")

    recovery = None
    if track_slowness and "slowness" in truth:
        s_mean = post_mean["slowness"]
        s_true = np.asarray(truth["slowness"])
        a = s_mean - s_mean.mean()
        b = s_true - s_true.mean()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        recovery = float((a * b).sum() / denom) if denom > 0 else 0.0

    n_total_steps = scfg.n_samples * scfg.n_chains
    summary = RunSummary(
        config=config, result=result, post_mean=post_mean, post_var=post_var,
        accept_rate=accept, rhat_max=rhat_max, ess_logpost=ess_lp,
        wall_time_s=wall, samples_per_sec=n_total_steps / wall,
        eff_samples_per_sec=ess_lp / wall,
        truth=jax.tree.map(np.asarray, truth), recovery_corr=recovery,
    )
    if verbose:
        print(f"[mceik-tpu] {scfg.algorithm} chains={scfg.n_chains} "
              f"warmup={scfg.n_warmup} samples={scfg.n_samples} "
              f"wall={wall:.2f}s accept={accept:.3f} rhat={rhat_max:.3f} "
              f"ess(logpost)={ess_lp:.1f} samples/s={summary.samples_per_sec:.1f} "
              + (f"recovery_corr={recovery:.3f}" if recovery is not None else ""))
    return summary
