"""Tempered SMC on a conjugate Gaussian target: posterior moments and the
log-evidence estimate must match closed forms (SURVEY.md §4
"Unit: samplers")."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mceik_tpu.samplers.smc import run_smc

SIGMA = 0.5
OBS = np.array([1.0, -1.0])


@dataclasses.dataclass(frozen=True)
class ToyPosterior:
    def log_prior(self, x):
        return -0.5 * jnp.sum(x * x)

    def log_lik(self, x):
        return -0.5 * jnp.sum((jnp.asarray(OBS, jnp.float32) - x) ** 2) / SIGMA**2

    def sample_prior(self, key):
        return jax.random.normal(key, (2,), jnp.float32)

    @property
    def prior_scales(self):
        return jnp.ones(2, jnp.float32)


def test_smc_gaussian_moments_and_evidence():
    post = ToyPosterior()
    result = run_smc(post, jax.random.PRNGKey(0), n_particles=2048,
                     n_mutation_steps=5, ess_threshold=0.5, step_size=0.5)
    x = np.asarray(result.state.params)
    prec = 1.0 + 1.0 / SIGMA**2
    mean_true = (1.0 / SIGMA**2) / prec * OBS
    var_true = 1.0 / prec
    np.testing.assert_allclose(x.mean(axis=0), mean_true, atol=0.08)
    np.testing.assert_allclose(x.var(axis=0), var_true, rtol=0.25)

    # Evidence: per-dim N(obs; 0, 1 + sigma^2), dropping nothing — the
    # tempered-SMC logZ should match within MC error.
    var_ev = 1.0 + SIGMA**2
    log_z_true = float(np.sum(-0.5 * np.log(2 * np.pi * var_ev)
                              - 0.5 * OBS**2 / var_ev))
    # log_lik omits its Gaussian normalization constant, which shifts logZ
    # by a constant: account for it.
    log_norm = float(2 * (-0.5 * np.log(2 * np.pi * SIGMA**2)))
    assert abs(result.log_evidence - (log_z_true - log_norm)) < 0.15, (
        result.log_evidence, log_z_true - log_norm)

    assert result.betas[-1] == 1.0
    assert result.n_stages >= 2
    assert min(result.accept_history) > 0.1
