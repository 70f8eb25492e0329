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


def test_sharded_smc():
    from tests.test_smc import ToyPosterior
    from mceik_tpu.samplers.smc import init_particles, run_smc

    post = ToyPosterior()
    result = run_smc(post, jax.random.PRNGKey(0), n_particles=1024,
                     n_mutation_steps=3, step_size=0.5)
    x = np.asarray(result.state.params)
    assert abs(x.mean(axis=0)[0] - 0.8) < 0.15
    assert result.betas[-1] == 1.0


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
