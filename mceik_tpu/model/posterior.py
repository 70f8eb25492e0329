"""Posterior builder: priors + Gaussian traveltime likelihood as one pure
``logpost(params) -> scalar`` closure (SURVEY.md §1 L2, §3.1).

The returned closure is jit/vmap/grad-safe; samplers never see geometry or
solver details. Modes:

- ``tomo``   — slowness only, known sources (configs 1-2).
- ``joint``  — slowness + hypocenters + origin times (configs 3/5).
- ``locate`` — hypocenters only over *fixed* slowness: station traveltime
  tables are precomputed once at build time, so each likelihood eval is
  just interpolation + reduction (SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mceik_tpu.config import EikonalCfg, ModelCfg
from mceik_tpu.eikonal.solve import EikonalConfig
from mceik_tpu.forward.predict import predict_events, predict_tomo, traveltime_tables
from mceik_tpu.grid import Grid
from mceik_tpu.model.data import EventData, TomoData
from mceik_tpu.model.params import (
    Params,
    box_from_raw,
    box_logjac,
    slowness_from_u,
)


def _eik_config(cfg: EikonalCfg) -> EikonalConfig:
    return EikonalConfig(
        method=cfg.method, tol=cfg.tol, max_iters=cfg.max_iters,
        n_inner=cfg.n_inner, seed_radius=cfg.seed_radius,
        use_pallas=cfg.use_pallas,
    )


@dataclasses.dataclass(frozen=True)
class PosteriorModel:
    """Bundle of pure functions defining the posterior."""

    logpost: Callable[[Params], jnp.ndarray]
    init_params: Callable[..., Params]  # (key, jitter=1.0) -> Params
    slowness_of: Callable[[Params], Optional[jnp.ndarray]]
    predict: Callable[[Params], jnp.ndarray]  # t_pred for diagnostics
    grid: Grid
    cfg: ModelCfg
    n_dim: int  # total number of sampled scalars
    prior_scales: Params = None  # per-leaf natural scales for proposals
    # Split components (SMC tempering needs the likelihood alone) and exact
    # prior sampling (SMC particle initialization).
    log_prior: Callable[[Params], jnp.ndarray] = None
    log_lik: Callable[[Params], jnp.ndarray] = None
    sample_prior: Callable[[jnp.ndarray], Params] = None


def _gaussian_loglik(r, sigma, mask):
    if mask is None:
        mask = jnp.ones_like(r)
    z = r / sigma
    return -0.5 * jnp.sum(mask * z * z) - jnp.sum(mask * jnp.log(sigma))


def build_posterior(
    cfg: ModelCfg,
    data,
    grid: Grid,
    eik_cfg: EikonalCfg = EikonalCfg(),
    differentiable: bool = False,
) -> PosteriorModel:
    """Construct the posterior for the given mode and observed data.

    ``differentiable=True`` routes slowness gradients through the implicit
    eikonal adjoint (required by HMC/NUTS; slightly more expensive).
    """
    econf = _eik_config(eik_cfg)
    D = grid.ndim
    bg = jnp.asarray(cfg.background_slowness, dtype=jnp.float32)

    def sigma_of(params: Params):
        sigma = jnp.asarray(cfg.sigma, dtype=jnp.float32)
        if cfg.hierarchical_noise and params.log_sigma is not None:
            sigma = sigma * jnp.exp(params.log_sigma)
        return sigma

    def log_prior(params: Params):
        lp = jnp.asarray(0.0, dtype=jnp.float32)
        if params.u is not None:
            lp += -0.5 * jnp.sum((params.u / cfg.prior_sigma_u) ** 2)
        if params.hypo_raw is not None:
            lp += box_logjac(params.hypo_raw)
        if params.t0 is not None:
            lp += -0.5 * jnp.sum((params.t0 / cfg.prior_sigma_t0) ** 2)
        if cfg.hierarchical_noise and params.log_sigma is not None:
            lp += -0.5 * jnp.sum((params.log_sigma / cfg.sigma_hyper) ** 2)
        return lp

    if cfg.mode == "tomo":
        assert isinstance(data, TomoData)
        n_src, n_rec = data.t_obs.shape

        def predict(params: Params):
            s = slowness_from_u(params.u, grid, bg)
            return predict_tomo(s, data.src_xyz, data.rec_xyz, grid, econf,
                                differentiable=differentiable)

        def log_lik(params: Params):
            r = data.t_obs - predict(params)
            return _gaussian_loglik(r, sigma_of(params), data.mask)

        def init_params(key, jitter: float = 1.0):
            ks = jax.random.split(key, 2)
            u = jitter * 0.1 * cfg.prior_sigma_u * jax.random.normal(
                ks[0], cfg.inv_shape, dtype=jnp.float32)
            ls = None
            if cfg.hierarchical_noise:
                shape = (n_rec,) if cfg.per_station_noise else ()
                ls = jitter * 0.1 * jax.random.normal(ks[1], shape, dtype=jnp.float32)
            return Params(u=u, log_sigma=ls)

        slowness_of = lambda p: slowness_from_u(p.u, grid, bg)

    elif cfg.mode in ("joint", "locate"):
        assert isinstance(data, EventData)
        n_ev, n_sta = data.t_obs.shape

        fixed_tables = None
        if cfg.mode == "locate":
            s_fixed = bg * jnp.ones(grid.shape, dtype=jnp.float32)
            fixed_tables = traveltime_tables(s_fixed, data.sta_xyz, grid, econf)

        def tables_of(params: Params):
            if cfg.mode == "locate":
                return fixed_tables
            s = slowness_from_u(params.u, grid, bg)
            return traveltime_tables(s, data.sta_xyz, grid, econf,
                                     differentiable=differentiable)

        def predict(params: Params):
            hypo = box_from_raw(params.hypo_raw, grid)
            t0 = params.t0 if params.t0 is not None else jnp.zeros(
                (params.hypo_raw.shape[0],), dtype=jnp.float32)
            return predict_events(tables_of(params), hypo, t0, grid)

        def log_lik(params: Params):
            r = data.t_obs - predict(params)
            mask = data.mask if data.mask is not None else jnp.ones_like(r)
            if cfg.marginalize_t0:
                # Exact origin-time marginalization under flat prior:
                # demean residuals per event (masked).
                n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
                r = r - jnp.sum(mask * r, axis=1, keepdims=True) / n
            return _gaussian_loglik(r, sigma_of(params), mask)

        def init_params(key, jitter: float = 1.0):
            ks = jax.random.split(key, 4)
            u = None
            if cfg.mode == "joint":
                u = jitter * 0.1 * cfg.prior_sigma_u * jax.random.normal(
                    ks[0], cfg.inv_shape, dtype=jnp.float32)
            hypo_raw = jitter * 0.5 * jax.random.normal(ks[1], (n_ev, D),
                                                        dtype=jnp.float32)
            t0 = None
            if not cfg.marginalize_t0:
                t0 = jitter * 0.1 * cfg.prior_sigma_t0 * jax.random.normal(
                    ks[2], (n_ev,), dtype=jnp.float32)
            ls = None
            if cfg.hierarchical_noise:
                shape = (n_sta,) if cfg.per_station_noise else ()
                ls = jitter * 0.1 * jax.random.normal(ks[3], shape, dtype=jnp.float32)
            return Params(u=u, hypo_raw=hypo_raw, t0=t0, log_sigma=ls)

        slowness_of = (
            (lambda p: slowness_from_u(p.u, grid, bg)) if cfg.mode == "joint"
            else (lambda p: None)
        )
    else:
        raise ValueError(f"unknown model mode {cfg.mode!r}")

    def logpost(params: Params):
        return log_prior(params) + log_lik(params)

    def sample_prior(key):
        """Exact draw from the prior in the unconstrained basis.

        hypo_raw's prior is standard logistic (the pushforward of the
        uniform-in-box prior through the inverse sigmoid)."""
        ks = jax.random.split(key, 4)
        ex = init_params(jax.random.PRNGKey(0))

        def maybe(field, draw):
            return None if getattr(ex, field) is None else draw

        u = maybe("u", lambda: cfg.prior_sigma_u * jax.random.normal(
            ks[0], cfg.inv_shape, dtype=jnp.float32))
        hypo_raw = maybe("hypo_raw", lambda: jax.random.logistic(
            ks[1], ex.hypo_raw.shape, dtype=jnp.float32))
        t0 = maybe("t0", lambda: cfg.prior_sigma_t0 * jax.random.normal(
            ks[2], ex.t0.shape, dtype=jnp.float32))
        ls = maybe("log_sigma", lambda: cfg.sigma_hyper * jax.random.normal(
            ks[3], jnp.shape(ex.log_sigma), dtype=jnp.float32))
        return Params(
            u=u() if callable(u) else u,
            hypo_raw=hypo_raw() if callable(hypo_raw) else hypo_raw,
            t0=t0() if callable(t0) else t0,
            log_sigma=ls() if callable(ls) else ls,
        )

    example = init_params(jax.random.PRNGKey(0))
    n_dim = sum(int(x.size) for x in jax.tree.leaves(example))

    scale_of = {
        "u": cfg.prior_sigma_u,
        "hypo_raw": 1.0,
        "t0": cfg.prior_sigma_t0,
        "log_sigma": cfg.sigma_hyper,
    }
    prior_scales = Params(**{
        f: (None if getattr(example, f) is None
            else jnp.full_like(getattr(example, f), scale_of[f]))
        for f in scale_of
    })

    return PosteriorModel(
        logpost=logpost,
        init_params=init_params,
        slowness_of=slowness_of,
        predict=predict,
        grid=grid,
        cfg=cfg,
        n_dim=n_dim,
        prior_scales=prior_scales,
        log_prior=log_prior,
        log_lik=log_lik,
        sample_prior=sample_prior,
    )
