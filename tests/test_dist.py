"""Distributed-path tests on the 8-virtual-device CPU mesh (SURVEY.md §4
"Distributed (no cluster)"): sharded runs must agree with single-device
runs modulo reduction order, and the driver's multichip dryrun must pass."""

import jax
import jax.numpy as jnp
import numpy as np

from mceik_tpu.dist.mesh import chain_mesh, shard_chains
from mceik_tpu.samplers import rwm
from mceik_tpu.samplers.base import init_chain_states, run_mcmc

COV_P = np.linalg.inv(np.array([[1.0, 0.3], [0.3, 2.0]]))


def _logpost(x):
    return -0.5 * x @ jnp.asarray(COV_P, jnp.float32) @ x


def _init(key):
    return jax.random.normal(key, (2,), jnp.float32)


def _run(states):
    return run_mcmc(rwm.make_kernel(_logpost), rwm.make_adapter(),
                    states, rwm.init_hyper(jnp.ones(2), 0.5),
                    jax.random.PRNGKey(1), n_warmup=100, n_steps=200)


def test_sharded_equals_unsharded():
    states = init_chain_states(_logpost, _init, jax.random.PRNGKey(0), 8)
    r_single = _run(states)

    mesh = chain_mesh(n_devices=8)
    states_sharded = shard_chains(states, mesh)
    r_sharded = _run(states_sharded)

    np.testing.assert_allclose(np.asarray(r_single.logpost_trace),
                               np.asarray(r_sharded.logpost_trace),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(r_single.hyper.log_step),
                               float(r_sharded.hyper.log_step), rtol=1e-4)


def test_sharded_smc_matches_unsharded():
    """Production-path sharded SMC (particles over an 8-device mesh via
    run_smc's mesh argument) must agree with the unsharded run: same
    ladder, matching posterior moments and evidence (reduction order is
    the only difference)."""
    from tests.test_smc import ToyPosterior, SIGMA, OBS
    from mceik_tpu.samplers.smc import run_smc

    post = ToyPosterior()
    kwargs = dict(n_particles=2048, n_mutation_steps=3, step_size=0.5)
    r_single = run_smc(post, jax.random.PRNGKey(0), **kwargs)

    mesh = chain_mesh(n_devices=8)
    r_sharded = run_smc(post, jax.random.PRNGKey(0), mesh=mesh, **kwargs)

    # The population stayed sharded through resample + mutation.
    assert r_sharded.state.params.sharding.spec[0] == "chains"

    assert r_sharded.betas[-1] == 1.0
    assert r_sharded.n_stages == r_single.n_stages
    np.testing.assert_allclose(r_sharded.betas, r_single.betas, atol=1e-4)
    assert abs(r_sharded.log_evidence - r_single.log_evidence) < 0.05

    xs = np.asarray(r_sharded.state.params)
    xu = np.asarray(r_single.state.params)
    prec = 1.0 + 1.0 / SIGMA**2
    mean_true = (1.0 / SIGMA**2) / prec * OBS
    np.testing.assert_allclose(xs.mean(axis=0), mean_true, atol=0.08)
    np.testing.assert_allclose(xs.mean(axis=0), xu.mean(axis=0), atol=0.08)
    np.testing.assert_allclose(xs.var(axis=0), xu.var(axis=0), rtol=0.3)


def test_smc_checkpoint_resume_exact(tmp_path):
    """A killed-mid-ladder SMC run resumes to the identical result
    (VERDICT r1: SMC state was never checkpointed)."""
    from tests.test_smc import ToyPosterior
    from mceik_tpu.samplers.smc import run_smc

    post = ToyPosterior()
    kwargs = dict(n_particles=512, n_mutation_steps=3, step_size=0.5,
                  ess_threshold=0.9)
    ck = str(tmp_path / "smc.h5")

    r_full = run_smc(post, jax.random.PRNGKey(3), **kwargs)
    assert r_full.n_stages >= 3, "toy ladder too short to test interruption"

    # "Crash" after 2 stages, then resume from the checkpoint.
    r_part = run_smc(post, jax.random.PRNGKey(3), max_stages=2,
                     checkpoint_path=ck, **kwargs)
    assert r_part.betas[-1] < 1.0
    r_res = run_smc(post, jax.random.PRNGKey(3), resume=ck, **kwargs)

    assert r_res.n_stages == r_full.n_stages
    np.testing.assert_allclose(r_res.betas, r_full.betas, rtol=1e-6)
    np.testing.assert_allclose(r_res.log_evidence, r_full.log_evidence,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_res.state.params),
                               np.asarray(r_full.state.params),
                               rtol=1e-6, atol=1e-6)


def test_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
