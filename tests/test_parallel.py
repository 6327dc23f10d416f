"""Multi-device tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from disentagled_multimodal_fusion_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rule,
    shard_batch,
    shard_params,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_param_sharding_rule():
    rule = param_sharding_rule(64)
    assert rule(jnp.zeros((32, 64))) == P(None, "model")   # column parallel
    assert rule(jnp.zeros((64, 32))) == P("model", None)   # row parallel
    assert rule(jnp.zeros((64,))) == P("model")
    assert rule(jnp.zeros((32, 32))) == P()
    assert rule(jnp.zeros((10,))) == P()


@needs_8
def test_sharded_matmul_matches_single_device():
    mesh = make_mesh(8, model_parallel=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32)).astype(np.float32)
    w1 = rng.standard_normal((32, 64)).astype(np.float32)
    w2 = rng.standard_normal((64, 8)).astype(np.float32)

    ref = np.maximum(x @ w1, 0) @ w2

    params = shard_params({"w1": jnp.asarray(w1), "w2": jnp.asarray(w2)}, mesh, 64)
    xb = jax.device_put(jnp.asarray(x), batch_sharding(mesh))

    @jax.jit
    def f(params, x):
        return jnp.maximum(x @ params["w1"], 0) @ params["w2"]

    out = f(params, xb)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@needs_8
def test_dryrun_multichip():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@needs_8
def test_sharded_dmvae_grads_match_replicated():
    """dp+tp sharded grads == single-device grads (same math, psum'd)."""
    import optax

    from disentagled_multimodal_fusion_tpu.models.dmvae import DMVAE

    mesh = make_mesh(8, model_parallel=2)
    dims = (12, 8)
    hidden = 32
    model = DMVAE(x_dims=dims, hidden_dim=hidden, embed_dim=4, a=1e-5)
    key = jax.random.PRNGKey(0)
    xs = [jax.random.normal(jax.random.PRNGKey(i), (16, d)) for i, d in enumerate(dims)]
    params = model.init({"params": key, "noise": key, "dropout": key}, xs, train=True)["params"]

    def loss(p, xs):
        l, _ = model.apply(
            {"params": p}, xs, train=True, rngs={"noise": key, "dropout": key}
        )
        return l

    g_ref = jax.grad(loss)(params, xs)

    p_sh = shard_params(params, mesh, hidden)
    xs_sh = shard_batch(xs, mesh)
    g_sh = jax.jit(jax.grad(loss))(p_sh, xs_sh)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


@needs_8
def test_train_many_on_mesh_matches_unsharded():
    """train_many(mesh=...) shards the instance axis over 'data' and
    reproduces the unsharded vmapped run bit-for-bit — through the REAL
    production task (build_probe_task) rather than a bespoke step."""
    from disentagled_multimodal_fusion_tpu.core.tasks import build_probe_task
    from disentagled_multimodal_fusion_tpu.core.train import train_many

    S, B, N, D, C = 8, 48, 2, 6, 4
    rng = np.random.default_rng(1)
    data = {
        "zc": jnp.asarray(rng.standard_normal((S, B, D)).astype(np.float32)),
        "zp": jnp.asarray(rng.standard_normal((S, B, N, D)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, C, (S, B))),
    }
    tasks = [
        build_probe_task(
            rng=jax.random.PRNGKey(s), num_modalities=N, num_classes=C,
            input_dim=D, hidden_dim=(16,), lr=3e-3, dropout=0.0,
            annealing_start=5, aggregation="cml", fused=1.0, num_epochs=4,
        )
        for s in range(S)
    ]
    params_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *[t.params for t in tasks])
    kwargs = dict(
        rngs=jnp.stack([jax.random.PRNGKey(100 + s) for s in range(S)]),
        loss_fn=tasks[0].loss_fn, data_stack=data, n_train=B,
        optimizer=tasks[0].optimizer, epochs=4, batch_size=16,
        val_fn=tasks[0].val_fn, val_data_stack=data,
    )
    res_plain = train_many(params_stack=params_stack, **kwargs)
    mesh = make_mesh(8, model_parallel=1)
    res_mesh = train_many(params_stack=params_stack, mesh=mesh, **kwargs)
    for a, b in zip(jax.tree.leaves(res_plain.params), jax.tree.leaves(res_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res_plain.val_acc), np.asarray(res_mesh.val_acc), rtol=1e-6
    )
    # instance count not divisible by the data axis -> clear error
    with pytest.raises(ValueError, match="must divide"):
        train_many(
            params_stack=jax.tree.map(lambda a: a[:6], params_stack),
            rngs=kwargs["rngs"][:6], loss_fn=tasks[0].loss_fn,
            data_stack=jax.tree.map(lambda a: a[:6], data), n_train=B,
            optimizer=tasks[0].optimizer, epochs=2, batch_size=16, mesh=mesh,
        )


@needs_8
def test_train_dp_tp_through_real_dmvae_task():
    """dp+tp (mesh 4x2, tp_hidden_dim) through core.train.train on the real
    build_dmvae_task matches the single-device run."""
    from disentagled_multimodal_fusion_tpu.core.tasks import build_dmvae_task
    from disentagled_multimodal_fusion_tpu.core.train import train

    rng = np.random.default_rng(2)
    dims = (12, 8)
    hidden = 32
    xs = tuple(jnp.asarray(rng.standard_normal((64, d)).astype(np.float32)) for d in dims)
    model, params, loss_fn, opt, bstats = build_dmvae_task(
        rng=jax.random.PRNGKey(0), xs_sample=xs, output_dim=dims,
        a=1e-5, hidden_dim=hidden, embed_dim=4, lr=1e-3, num_epochs=5,
        fused_modalities=True,
    )
    kwargs = dict(
        rng=jax.random.PRNGKey(1), loss_fn=loss_fn, data={"xs": xs},
        n_train=64, optimizer=opt, epochs=5, batch_size=16,
        model_state=bstats, donate=False,
    )
    res_single = train(params=params, **kwargs)
    mesh = make_mesh(8, model_parallel=2)
    res_mesh = train(params=params, mesh=mesh, tp_hidden_dim=hidden, **kwargs)
    for a, b in zip(jax.tree.leaves(res_single.params), jax.tree.leaves(res_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(res_single.train_loss), np.asarray(res_mesh.train_loss),
        rtol=1e-3, atol=1e-6,
    )


@needs_8
def test_train_with_data_parallel_mesh_matches_single_device():
    """train(mesh=...) shards the dataset rows over 'data' and reproduces
    the single-device run (jit inserts the grad all-reduce)."""
    from disentagled_multimodal_fusion_tpu.core.train import OptimizerConfig, train

    rng = np.random.default_rng(0)
    x = rng.standard_normal((96, 8)).astype(np.float32)
    w_true = rng.standard_normal((8, 1)).astype(np.float32)
    y = x @ w_true
    data = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    params = {"w": jnp.zeros((8, 1))}

    def loss_fn(params, batch, mask, t, key):
        se = (batch["x"] @ params["w"] - batch["y"]) ** 2
        m = mask[:, None]
        return jnp.sum(se * m) / jnp.maximum(jnp.sum(m), 1.0), {}

    kwargs = dict(
        rng=jax.random.PRNGKey(0), loss_fn=loss_fn, data=data, n_train=96,
        optimizer=OptimizerConfig(name="adam", lr=3e-2), epochs=60,
        batch_size=16, donate=False,
    )
    res_single = train(params=params, **kwargs)
    mesh = make_mesh(8, model_parallel=1)
    res_mesh = train(params=params, mesh=mesh, **kwargs)
    np.testing.assert_allclose(
        np.asarray(res_mesh.params["w"]), np.asarray(res_single.params["w"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_mesh.train_loss), np.asarray(res_single.train_loss),
        rtol=1e-4, atol=1e-6,
    )


# ------------------------------------------------- multi-host scaffolding
def test_distributed_initialize_single_process_noop():
    """No coordinator env vars -> initialize() is a no-op returning False."""
    import os

    from disentagled_multimodal_fusion_tpu.parallel.distributed import initialize

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        assert var not in os.environ  # test env is single-process
    assert initialize() is False
    assert jax.process_count() == 1


def test_distributed_initialize_single_host_marker_noop(monkeypatch):
    """A single-entry TPU_WORKER_HOSTNAMES (what a one-host runtime like
    this image's axon relay exports) must NOT trigger pod auto-init."""
    from disentagled_multimodal_fusion_tpu.parallel.distributed import initialize

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert initialize() is False


def test_process_rows_partition():
    """process_rows covers [0, n) exactly once for any process count."""
    from disentagled_multimodal_fusion_tpu.parallel.distributed import process_rows

    n = 103
    for pc in (1, 2, 4, 8):
        covered = []
        for pid in range(pc):
            # simulate pid under a pc-process cluster
            per = -(-n // pc)
            s = process_rows(n, process_id=pid, num_processes=pc)
            assert s == slice(pid * per, min(n, (pid + 1) * per))
            covered.extend(range(s.start, s.stop))
        assert covered == list(range(n))


@needs_8
def test_shard_global_matches_device_put_single_process():
    """Single-process shard_global == sharded device_put, bitwise."""
    from disentagled_multimodal_fusion_tpu.parallel.distributed import shard_global

    mesh = make_mesh(8, model_parallel=1)
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    a = shard_global({"x": x}, mesh, P("data"))["x"]
    b = jax.device_put(x, NamedSharding(mesh, P("data")))
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # replicated spec too (the data_broadcast path of train_many)
    r = shard_global({"x": x}, mesh, P())["x"]
    assert r.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(r), np.asarray(x))


@needs_8
def test_global_mesh_model_groups_contiguous():
    """global_mesh keeps each 'model' group a contiguous id run (ICI-local)."""
    from disentagled_multimodal_fusion_tpu.parallel.distributed import global_mesh

    mesh = global_mesh(model_parallel=2)
    assert mesh.axis_names == ("data", "model")
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert ids.shape == (len(jax.devices()) // 2, 2)
    for row in ids:
        assert row[1] == row[0] + 1  # contiguous -> same host/slice


def test_host_local_block_partition():
    """shard_global's multi-process slicing: leading-sharded specs give each
    process its contiguous block; replicated specs pass the array whole."""
    from disentagled_multimodal_fusion_tpu.parallel.distributed import (
        host_local_block,
    )

    x = np.arange(8 * 3).reshape(8, 3)
    blocks = [host_local_block(x, P("data"), process_id=p, num_processes=4)
              for p in range(4)]
    assert all(b.shape == (2, 3) for b in blocks)
    np.testing.assert_array_equal(np.concatenate(blocks), x)
    # replicated / inner-only: full array on every process
    np.testing.assert_array_equal(
        host_local_block(x, P(), process_id=1, num_processes=4), x)
    np.testing.assert_array_equal(
        host_local_block(x, P(None, "model"), process_id=1, num_processes=4), x)
