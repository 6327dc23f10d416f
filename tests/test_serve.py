"""Serving path (core/serve.py): fused inference, bucketing, jax.export.

The reference has no deployment story (models die with their Lightning
sweep process, run.py:179-326); these tests pin the contract of ours:
the backbone-folded program is bit-equal to the train-time two-step
math, bucketing padding never leaks into real rows, and the jax.export
artifact replays the program without model code or checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentagled_multimodal_fusion_tpu.core.serve import (
    DEFAULT_BUCKETS,
    ServingEngine,
    build_inference_fn,
    export_inference,
    load_exported,
)
from disentagled_multimodal_fusion_tpu.core.tasks import (
    build_dmvae_task,
    build_late_fusion_task,
    build_probe_task,
    embed_dataset,
)


@pytest.fixture(scope="module")
def views():
    rng = np.random.RandomState(0)
    return tuple(
        jnp.asarray(rng.randn(16, d).astype(np.float32)) for d in (12, 10)
    )


@pytest.fixture(scope="module")
def probe_setup(views):
    """Untrained-but-deterministic backbone + probe (init params suffice:
    serving correctness is about program equivalence, not accuracy)."""
    key = jax.random.PRNGKey(0)
    backbone, bb_params, _, _, _ = build_dmvae_task(
        rng=key, xs_sample=views, output_dim=[12, 10], embed_dim=8,
        hidden_dim=32, a=1e-5,
    )
    task = build_probe_task(
        rng=jax.random.PRNGKey(1), num_modalities=2, num_classes=3,
        input_dim=8, hidden_dim=(16,), lr=1e-3, dropout=0.1,
        aggregation="cml",
    )
    return backbone, bb_params, task


def test_backbone_folded_matches_two_step(views, probe_setup):
    backbone, bb_params, task = probe_setup
    infer = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    out = infer(views)

    zc, zp = embed_dataset(backbone, bb_params, views)
    ev = task.evidences_fn(task.params, {"zc": zc, "zp": zp})
    fused = task.aggregation(ev)
    np.testing.assert_allclose(out["evidence"], ev, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        out["fused_evidence"], fused, rtol=1e-6, atol=1e-6
    )
    assert out["pred"].shape == (16,)
    assert out["evidence"].shape == (16, 3, 3)  # [shared, v1, v2] layout


def test_output_semantics(views):
    task = build_late_fusion_task(
        rng=jax.random.PRNGKey(2), output_dims=[12, 10], num_classes=4,
        hidden_dim=(16,), dropout=0.1, lr=1e-3, aggregation="avg",
    )
    out = build_inference_fn(task, task.params)(views)
    np.testing.assert_allclose(
        jnp.sum(out["probs"], axis=-1), np.ones(16), rtol=1e-5
    )
    np.testing.assert_array_equal(
        out["pred"], jnp.argmax(out["fused_evidence"], axis=-1)
    )
    # epistemic = K/S in (0, 1]; aleatoric >= 0 (ops/dirichlet.py)
    assert float(jnp.min(out["epistemic"])) > 0.0
    assert float(jnp.max(out["epistemic"])) <= 1.0
    assert float(jnp.min(out["aleatoric"])) >= 0.0


def test_stateful_task_requires_trained_state(views):
    task = build_late_fusion_task(
        rng=jax.random.PRNGKey(3), output_dims=[12, 10], num_classes=3,
        hidden_dim=(16,), dropout=0.1, lr=1e-3, aggregation="cml",
    )
    fake_stateful = task._replace(model_state={"batch_stats": {}})
    with pytest.raises(ValueError, match="TRAINED model_state"):
        build_inference_fn(fake_stateful, task.params)


def test_bucketing_matches_exact_batch(views, probe_setup):
    backbone, bb_params, task = probe_setup
    infer = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    engine = ServingEngine(infer, buckets=(4, 8))
    xs5 = tuple(x[:5] for x in views)
    out = engine(xs5)  # padded to bucket 8, sliced back
    direct = infer(xs5)
    for k in out:
        assert out[k].shape[0] == 5, k
        np.testing.assert_allclose(out[k], direct[k], rtol=1e-6, atol=1e-6)


def test_bucket_rounding():
    engine = ServingEngine(lambda xs: {"x": xs[0]}, buckets=(4, 8))
    assert engine.bucket_for(1) == 4
    assert engine.bucket_for(8) == 8
    assert engine.bucket_for(9) == 16   # beyond top: next multiple of 8
    assert engine.bucket_for(20) == 24
    with pytest.raises(ValueError):
        ServingEngine(lambda xs: xs, buckets=())


def test_oversize_batch_and_warmup(views, probe_setup):
    backbone, bb_params, task = probe_setup
    infer = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    engine = ServingEngine(infer, buckets=(4,))
    engine.warmup(views)
    out = engine(views)  # 16 rows over a top bucket of 4
    np.testing.assert_allclose(
        out["fused_evidence"], infer(views)["fused_evidence"],
        rtol=1e-6, atol=1e-6,
    )


def test_export_roundtrip(tmp_path, views, probe_setup):
    backbone, bb_params, task = probe_setup
    infer = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    xs8 = tuple(x[:8] for x in views)
    path = str(tmp_path / "probe_b8.stablehlo")
    export_inference(infer, xs8, path)
    served = load_exported(path)
    out = served(xs8)
    direct = infer(xs8)
    for k in direct:
        np.testing.assert_allclose(
            out[k], direct[k], rtol=1e-5, atol=1e-6
        )


def test_default_buckets_sorted():
    assert DEFAULT_BUCKETS == tuple(sorted(DEFAULT_BUCKETS))


def test_export_replays_without_package(tmp_path, views, probe_setup):
    """The .stablehlo artifact must replay in an interpreter that NEVER
    imports this package — the 'hand it to a serving fleet' claim of
    core/serve.py: program + weights are self-contained."""
    import os
    import subprocess
    import sys

    backbone, bb_params, task = probe_setup
    infer = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    xs4 = tuple(x[:4] for x in views)
    art = tmp_path / "probe_b4.stablehlo"
    export_inference(infer, xs4, str(art))
    direct = jax.device_get(infer(xs4))
    np.savez(
        tmp_path / "io.npz",
        x0=np.asarray(xs4[0]), x1=np.asarray(xs4[1]),
        fused=direct["fused_evidence"], probs=direct["probs"],
    )
    script = f"""
import sys
import numpy as np
import jax
io = np.load({str(tmp_path / "io.npz")!r})
exported = jax.export.deserialize(open({str(art)!r}, 'rb').read())
out = exported.call((io['x0'], io['x1']))
np.testing.assert_allclose(out['fused_evidence'], io['fused'], rtol=1e-5, atol=1e-6)
np.testing.assert_allclose(out['probs'], io['probs'], rtol=1e-5, atol=1e-6)
bad = [m for m in sys.modules if 'disentagled' in m]
assert not bad, f'package leaked into the replay interpreter: {{bad}}'
print('REPLAY_OK')
"""
    # A TPU-relay sitecustomize (when present) force-registers a tpu
    # backend in every interpreter; drop its gate var so the replay
    # subprocess is a plain CPU jax matching the exported platform.
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "REPLAY_OK" in proc.stdout


# ---- ServingDaemon (core/daemon.py): the micro-batching front ----------


def _toy_engine(calls=None, delay=0.0):
    from disentagled_multimodal_fusion_tpu.core.serve import ServingEngine

    def fn(xs):
        if calls is not None:
            calls.append(int(xs[0].shape[0]))
        if delay:
            import time

            time.sleep(delay)
        return {"y": np.asarray(xs[0]) * 2.0, "s": np.asarray(xs[0]).sum(1)}

    return ServingEngine(fn, buckets=(8, 16))


def test_daemon_matches_direct():
    from disentagled_multimodal_fusion_tpu.core.daemon import ServingDaemon

    engine = _toy_engine()
    with ServingDaemon(engine, max_delay_ms=5.0) as d:
        xs = [np.random.RandomState(i).randn(i + 1, 6).astype(np.float32)
              for i in range(5)]
        futs = [d.submit((x,)) for x in xs]
        for x, f in zip(xs, futs):
            out = f.result(timeout=30)
            assert out["y"].shape == x.shape
            np.testing.assert_allclose(out["y"], x * 2.0, rtol=1e-6)
            np.testing.assert_allclose(out["s"], x.sum(1), rtol=1e-5)


def test_daemon_coalesces_to_bucket():
    """4x 2-row requests under a long deadline flush EARLY the moment the
    8-row bucket fills, and ride ONE device call."""
    from disentagled_multimodal_fusion_tpu.core.daemon import ServingDaemon

    calls = []
    engine = _toy_engine(calls, delay=0.05)
    with ServingDaemon(engine, max_delay_ms=10_000.0, max_batch=8) as d:
        # first request occupies the dispatcher (50 ms engine sleep);
        # the next four queue behind it and fill bucket 8 exactly
        first = d.submit((np.ones((8, 4), np.float32),))
        futs = [d.submit((np.full((2, 4), i, np.float32),)) for i in range(4)]
        first.result(timeout=30)
        for i, f in enumerate(futs):
            np.testing.assert_allclose(
                f.result(timeout=30)["y"], np.full((2, 4), 2.0 * i)
            )
    assert calls[0] == 8
    # the four riders coalesced (one call of 8 rows), not four calls
    assert calls[1:] == [8], calls


def test_daemon_deadline_flushes_partial():
    from disentagled_multimodal_fusion_tpu.core.daemon import ServingDaemon

    calls = []
    with ServingDaemon(_toy_engine(calls), max_delay_ms=30.0) as d:
        out = d.infer((np.ones((3, 4), np.float32),))  # 3 < bucket 8
        np.testing.assert_allclose(out["y"], 2.0 * np.ones((3, 4)))
    assert calls == [8]  # padded to the bucket, one call


def test_daemon_concurrent_clients():
    import threading

    from disentagled_multimodal_fusion_tpu.core.daemon import ServingDaemon

    engine = _toy_engine()
    errs = []

    def client(d, cid):
        try:
            rng = np.random.RandomState(cid)
            for _ in range(10):
                x = rng.randn(1 + cid % 4, 5).astype(np.float32)
                np.testing.assert_allclose(
                    d.infer((x,))["y"], x * 2.0, rtol=1e-6
                )
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    with ServingDaemon(engine, max_delay_ms=1.0) as d:
        ts = [threading.Thread(target=client, args=(d, i)) for i in range(6)]
        [t.start() for t in ts]
        [t.join(60) for t in ts]
        st = d.stats()
    assert not errs
    assert st["requests"] == 60
    assert st["latency_ms"]["p99"] is not None


def test_daemon_error_propagates_and_close():
    from disentagled_multimodal_fusion_tpu.core.daemon import ServingDaemon
    from disentagled_multimodal_fusion_tpu.core.serve import ServingEngine

    def boom(xs):
        raise RuntimeError("engine down")

    d = ServingDaemon(ServingEngine(boom, buckets=(4,)), max_delay_ms=1.0)
    f = d.submit((np.ones((2, 3), np.float32),))
    with pytest.raises(RuntimeError, match="engine down"):
        f.result(timeout=30)
    d.close()
    with pytest.raises(RuntimeError, match="closed"):
        d.submit((np.ones((1, 3), np.float32),))
    with pytest.raises(ValueError, match="rows"):
        ServingDaemon(_toy_engine()).submit(
            (np.ones((2, 3)), np.ones((3, 3)))
        )


def test_mesh_sharded_serving_matches_single_device(views, probe_setup):
    from disentagled_multimodal_fusion_tpu.parallel.mesh import make_mesh

    backbone, bb_params, task = probe_setup
    plain = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    mesh = make_mesh(8)
    sharded = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params,
        mesh=mesh,
    )
    engine = ServingEngine(sharded, buckets=(4, 16), divisor=8)
    assert engine.buckets == (8, 16)  # 4 rounded up to the data-axis size
    out = engine(tuple(x[:5] for x in views))
    ref = plain(tuple(x[:5] for x in views))
    for k in ref:
        assert out[k].shape == ref[k].shape, k
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-5, atol=1e-6)


# ---- HTTP front (core/http_front.py): the network edge ------------------


def _http(method, port, path, body=None, timeout=30):
    import json as _json
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=None if body is None else _json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method=method,
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, _json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, _json.loads(e.read())


@pytest.fixture()
def http_front():
    from disentagled_multimodal_fusion_tpu.core.daemon import ServingDaemon
    from disentagled_multimodal_fusion_tpu.core.http_front import start_http_server

    engine = _toy_engine()
    with ServingDaemon(engine, max_delay_ms=2.0) as daemon:
        server, port = start_http_server(daemon)
        try:
            yield port
        finally:
            server.shutdown()


def test_http_infer_matches_engine(http_front):
    """POST /v1/infer round-trips through daemon + engine row-exactly."""
    x = np.random.RandomState(0).randn(5, 6).astype(np.float32)
    status, resp = _http("POST", http_front, "/v1/infer",
                         {"views": [x.tolist()]})
    assert status == 200
    assert resp["rows"] == 5
    np.testing.assert_allclose(np.asarray(resp["y"]), x * 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(resp["s"]), x.sum(1), rtol=1e-5)


def test_http_fields_filter_and_errors(http_front):
    x = [[1.0] * 6, [2.0] * 6]
    status, resp = _http("POST", http_front, "/v1/infer",
                         {"views": [x], "fields": ["s"]})
    assert status == 200 and set(resp) == {"rows", "s"}
    # unknown field -> 400 listing what exists
    status, resp = _http("POST", http_front, "/v1/infer",
                         {"views": [x], "fields": ["nope"]})
    assert status == 400 and "nope" in resp["error"]
    # malformed views (1-D row list, not (rows, dim)) -> 400 not 500
    status, resp = _http("POST", http_front, "/v1/infer",
                         {"views": [[1.0, 2.0]]})
    assert status == 400 and "rows, dim" in resp["error"]
    # missing body / bad route
    status, _ = _http("POST", http_front, "/v1/wrong", {"views": [x]})
    assert status == 404
    status, resp = _http("GET", http_front, "/nope")
    assert status == 404


def test_http_stats_and_health(http_front):
    status, h = _http("GET", http_front, "/healthz")
    assert status == 200 and h["ok"] is True
    x = [[0.0] * 6]
    assert _http("POST", http_front, "/v1/infer", {"views": [x]})[0] == 200
    status, st = _http("GET", http_front, "/v1/stats")
    assert status == 200
    assert st["requests"] >= 1 and st["buckets"] == [8, 16]
    assert st["latency_ms"]["p50"] is not None


def test_http_concurrent_clients_coalesce(http_front):
    """N threads POSTing simultaneously produce correct per-client rows
    (the daemon slices coalesced batches back row-exactly)."""
    import threading

    results = {}

    def client(cid):
        x = np.full((2, 6), float(cid), np.float32)
        results[cid] = _http("POST", http_front, "/v1/infer",
                             {"views": [x.tolist()]})

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    for cid, (status, resp) in results.items():
        assert status == 200
        np.testing.assert_allclose(
            np.asarray(resp["y"]), np.full((2, 6), 2.0 * cid), rtol=1e-6
        )


def test_http_engine_failure_is_500():
    from disentagled_multimodal_fusion_tpu.core.daemon import ServingDaemon
    from disentagled_multimodal_fusion_tpu.core.http_front import start_http_server

    def boom(xs):
        raise RuntimeError("device on fire")

    engine = ServingEngine(boom, buckets=(4,))
    with ServingDaemon(engine, max_delay_ms=1.0) as daemon:
        server, port = start_http_server(daemon)
        try:
            status, resp = _http("POST", port, "/v1/infer",
                                 {"views": [[[1.0, 2.0, 3.0]]]})
            assert status == 500 and "device on fire" in resp["error"]
        finally:
            server.shutdown()


def test_daemon_survives_cancelled_future():
    """A client cancelling its pending Future must not kill the dispatcher
    (set_result on a cancelled Future raises InvalidStateError)."""
    from disentagled_multimodal_fusion_tpu.core.daemon import ServingDaemon

    with ServingDaemon(_toy_engine(delay=0.05), max_delay_ms=1.0) as d:
        f = d.submit((np.zeros((1, 6), np.float32),))
        f.cancel()  # may or may not win the race with the dispatcher
        # the daemon must still serve later requests either way
        x = np.ones((2, 6), np.float32)
        out = d.infer((x,))
        np.testing.assert_allclose(out["y"], x * 2.0)
        assert d._thread.is_alive()


def test_daemon_queue_full_backpressure():
    from disentagled_multimodal_fusion_tpu.core.daemon import (
        QueueFullError,
        ServingDaemon,
    )

    # a slow engine + tiny queue bound: the second submit must be rejected
    # loudly, not buffered without limit
    d = ServingDaemon(_toy_engine(delay=0.2), max_delay_ms=0.0,
                      max_queue_rows=4)
    try:
        futs = [d.submit((np.zeros((4, 6), np.float32),))]
        with pytest.raises(QueueFullError):
            for _ in range(50):  # the dispatcher may drain between submits
                futs.append(d.submit((np.zeros((4, 6), np.float32),)))
        assert d.stats()["queued_rows"] >= 0
        for f in futs:
            f.result(timeout=30)
    finally:
        d.close()


def test_daemon_rejects_nonpositive_limits():
    from disentagled_multimodal_fusion_tpu.core.daemon import ServingDaemon

    with pytest.raises(ValueError, match="max_batch"):
        ServingDaemon(_toy_engine(), max_batch=0)
    with pytest.raises(ValueError, match="max_queue_rows"):
        ServingDaemon(_toy_engine(), max_queue_rows=0)


def test_http_request_errors_are_400_not_500(http_front):
    # row-count mismatch across views is caught by the daemon's
    # validation; the HTTP front must report it as a client error
    status, resp = _http("POST", http_front, "/v1/infer",
                         {"views": [[[1.0, 2.0]], [[1.0, 2.0], [3.0, 4.0]]]})
    assert status == 400 and "disagree" in resp["error"]
