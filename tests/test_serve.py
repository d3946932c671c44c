"""Serving subsystem: micro-batching predictor correctness (vs the direct
eval step), bucket padding, backpressure, stats, and the HTTP layer
end-to-end on an ephemeral port.

The reference has no serving path (SURVEY §1: ``inference.py`` gitignored);
correctness ground truth is this repo's own jitted eval step on the same
inputs.
"""
import base64
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import (DuettConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig, ViTConfig)
from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
from multimodal_edema_prediction_tpu.serve import (BatchingPredictor,
                                                   QueueFullError,
                                                   make_server, serve_forever)
from multimodal_edema_prediction_tpu.train import engine
from multimodal_edema_prediction_tpu.train.teacher_loop import init_teacher

S_IMG = 28


def tiny_cfg():
    return TeacherConfig(
        duett=DuettConfig(n_variables=6, n_timesteps=24, d_embedding=8,
                          n_layers=1, d_feedforward=16,
                          d_hidden_mlp_embedding=8, d_hidden_tab_encoder=8),
        vit=ViTConfig(image_size=S_IMG, patch_size=14, d_model=16, n_layers=1,
                      n_heads=2, d_feedforward=32),
        perceiver=PerceiverConfig(d_latent=16, n_heads=2, head_hidden=8))


@pytest.fixture(scope="module")
def served():
    cfg = tiny_cfg()
    model = TeacherModel(cfg)
    variables = init_teacher(model, cfg, 4, cfg.duett.n_timesteps,
                             jax.random.key(0))
    pred = BatchingPredictor(
        model, variables["params"], variables["batch_stats"],
        max_batch=8, max_wait_ms=20.0, max_queue=64, dtype=jnp.float32,
        labels=[f"label_{i}" for i in range(7)]).start()
    T, V = cfg.duett.n_timesteps, cfg.duett.n_variables
    example = {"x_ts": np.zeros((T, 2 * V), np.float32),
               "static": np.zeros(cfg.duett.d_static, np.float32),
               "pixel_u8": np.zeros((S_IMG, S_IMG, 3), np.uint8)}
    pred.warmup(example)
    yield cfg, model, variables, pred
    pred.close()


def _requests(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    T, V, D = (cfg.duett.n_timesteps, cfg.duett.n_variables,
               cfg.duett.d_static)
    out = []
    for _ in range(n):
        out.append({
            "x_ts": rng.normal(size=(T, 2 * V)).astype(np.float32),
            "static": rng.normal(size=D).astype(np.float32),
            "pixel_u8": rng.integers(0, 255, (S_IMG, S_IMG, 3),
                                     dtype=np.uint8),
        })
    return out


def _direct_logits(model, variables, reqs, cfg):
    """Ground truth: the raw eval step on the exact same batch."""
    step = engine.make_teacher_eval_from_windows(model, jnp.float32)
    x_ts = np.stack([r["x_ts"] for r in reqs])
    static = np.stack([r["static"] for r in reqs])
    T = cfg.duett.n_timesteps
    batch = {"bin_ends": np.broadcast_to(
                 (np.arange(1, T + 1) / 24.0).astype(np.float32),
                 (len(reqs), T)).copy(),
             "pixel_u8": np.stack([r["pixel_u8"] for r in reqs])}
    out = step(variables["params"], variables["batch_stats"], x_ts, static,
               batch)
    return np.asarray(out["fusion_logits"], np.float32)


def test_predictions_match_direct_eval(served):
    cfg, model, variables, pred = served
    reqs = _requests(cfg, 5)
    got = [pred.predict(r) for r in reqs]            # sequential → bucket 1
    want = _direct_logits(model, variables, reqs, cfg)
    for i, g in enumerate(got):
        np.testing.assert_allclose(np.asarray(g["fusion_logits"]), want[i],
                                   rtol=2e-4, atol=2e-4)
        assert g["labels"] == pred.labels
        p = np.asarray(g["probabilities"])
        np.testing.assert_allclose(p, 1 / (1 + np.exp(-want[i])),
                                   rtol=2e-4, atol=2e-4)
        assert g["main_probability"] == pytest.approx(p[0])


def test_concurrent_submits_batch_and_pad_correctly(served):
    cfg, model, variables, pred = served
    reqs = _requests(cfg, 11, seed=1)                # pads 11 → bucket 16? no: max 8
    futures = [pred.submit(r) for r in reqs]         # coalesced by batcher
    got = np.stack([np.asarray(f.result(timeout=60.0)["fusion_logits"])
                    for f in futures])
    want = _direct_logits(model, variables, reqs, cfg)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    st = pred.stats()
    assert st["n_requests"] >= 11
    assert max(int(k) for k in st["batch_size_hist"]) > 1   # coalescing happened


def test_backpressure_queue_full(served):
    cfg, model, variables, _ = served
    pred = BatchingPredictor(
        model, variables["params"], variables["batch_stats"],
        max_batch=2, max_queue=2, dtype=jnp.float32)
    req = _requests(cfg, 1)[0]
    with pytest.raises(RuntimeError):
        pred.submit(req)                 # not started
    pred._running = True                 # queue fills: batcher never drains
    try:
        pred.submit(req)
        pred.submit(req)
        with pytest.raises(QueueFullError):
            pred.submit(req)
        assert pred.stats()["n_rejected"] == 1
    finally:
        pred._running = False


def test_validation_errors(served):
    cfg, _, _, pred = served
    good = _requests(cfg, 1)[0]
    bad = dict(good)
    bad["x_ts"] = np.zeros((3,), np.float32)          # wrong rank
    with pytest.raises(ValueError):
        pred.submit(bad)
    bad2 = dict(good)
    bad2.pop("pixel_u8")
    with pytest.raises(ValueError):                   # pixel mode needs pixels
        pred.submit(bad2)
    bad3 = dict(good)
    bad3["bin_ends"] = np.zeros(5, np.float32)        # wrong length
    with pytest.raises(ValueError):
        pred.submit(bad3)


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_server_end_to_end(served):
    cfg, model, variables, pred = served
    server = make_server(pred, "127.0.0.1", 0,
                         meta={"image_size": S_IMG,
                               "n_timesteps": cfg.duett.n_timesteps})
    serve_forever(server, background=True)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(f"{base}/v1/meta", timeout=30) as r:
            meta = json.loads(r.read())
        assert meta["image_size"] == S_IMG
        assert meta["labels"] == pred.labels

        reqs = _requests(cfg, 3, seed=2)
        instances = []
        for r in reqs:
            instances.append({
                "x_ts": r["x_ts"].tolist(),
                "static": r["static"].tolist(),
                "pixel_u8_b64": base64.b64encode(
                    r["pixel_u8"].tobytes()).decode(),
            })
        code, resp = _post(f"{base}/v1/predict", {"instances": instances})
        assert code == 200
        want = _direct_logits(model, variables, reqs, cfg)
        got = np.asarray([p["fusion_logits"] for p in resp["predictions"]])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

        # concurrent clients (the threading server + single batcher thread)
        results = {}
        def worker(i):
            results[i] = _post(f"{base}/v1/predict",
                               {"instances": [instances[i % 3]]})
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        [t.start() for t in threads]
        [t.join(timeout=120) for t in threads]
        assert all(results[i][0] == 200 for i in range(6))

        code, resp = _post(f"{base}/v1/predict", {"instances": []})
        assert code == 400
        code, resp = _post(f"{base}/v1/predict",
                           {"instances": [{"x_ts": [[0.0]]}]})
        assert code == 400                         # missing static / pixels

        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            st = json.loads(r.read())
        assert st["n_requests"] >= 9
        assert st["latency_ms_p50"] > 0
    finally:
        server.shutdown()
        server.server_close()


def test_bank_mode_uses_image_ids():
    """Bank mode: requests carry image_id only; results match the direct
    eval with the same bank rows."""
    from multimodal_edema_prediction_tpu.train.teacher_loop import \
        make_bank_image_source
    cfg = tiny_cfg()
    model = TeacherModel(cfg)
    variables = init_teacher(model, cfg, 4, cfg.duett.n_timesteps,
                             jax.random.key(1))
    rng = np.random.default_rng(3)
    bank = jnp.asarray(rng.normal(size=(4, S_IMG, S_IMG, 3))
                       .astype(np.float32))
    pred = BatchingPredictor(
        model, variables["params"], variables["batch_stats"],
        image_source=make_bank_image_source(bank),
        max_batch=4, max_wait_ms=5.0, dtype=jnp.float32).start()
    try:
        T, V, D = (cfg.duett.n_timesteps, cfg.duett.n_variables,
                   cfg.duett.d_static)
        reqs = [{"x_ts": rng.normal(size=(T, 2 * V)).astype(np.float32),
                 "static": rng.normal(size=D).astype(np.float32),
                 "image_id": i} for i in range(3)]
        got = np.stack([np.asarray(pred.predict(r)["fusion_logits"])
                        for r in reqs])

        step = engine.make_teacher_eval_from_windows(
            model, jnp.float32, image_source=make_bank_image_source(bank))
        batch = {"bin_ends": np.broadcast_to(
                     (np.arange(1, T + 1) / 24.0).astype(np.float32),
                     (3, T)).copy(),
                 "image_ids": np.arange(3, dtype=np.int32)}
        out = step(variables["params"], variables["batch_stats"],
                   np.stack([r["x_ts"] for r in reqs]),
                   np.stack([r["static"] for r in reqs]), batch)
        np.testing.assert_allclose(
            got, np.asarray(out["fusion_logits"]), rtol=2e-4, atol=2e-4)
    finally:
        pred.close()


@pytest.mark.slow   # >30 s on the 1-core host
def test_mesh_mode_dp_over_8_devices():
    """Multi-chip serving: buckets are multiples of the data axis, batches
    shard over it, and results match the single-device predictor."""
    from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
    cfg = tiny_cfg()
    model = TeacherModel(cfg)
    variables = init_teacher(model, cfg, 4, cfg.duett.n_timesteps,
                             jax.random.key(2))
    mesh = meshlib.create_mesh(4, 2)
    params = meshlib.shard_params(variables["params"], mesh)
    pred = BatchingPredictor(
        model, params, variables["batch_stats"], max_batch=16,
        max_wait_ms=30.0, dtype=jnp.float32, mesh=mesh).start()
    try:
        assert pred.buckets == (4, 8, 16)          # multiples of data=4
        reqs = _requests(cfg, 6, seed=4)
        futures = [pred.submit(r) for r in reqs]
        got = np.stack([np.asarray(f.result(timeout=120.0)["fusion_logits"])
                        for f in futures])
        want = _direct_logits(model, variables, reqs, cfg)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    finally:
        pred.close()


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_aot_warmup_persists_and_reloads(tmp_path):
    """AOT serving tier: warmup persists each bucket's compiled executable
    (utils/aot.py); a fresh predictor (fresh process in production) reloads
    them instead of recompiling, and served results are identical."""
    cfg = tiny_cfg()
    model = TeacherModel(cfg)
    variables = init_teacher(model, cfg, 4, cfg.duett.n_timesteps,
                             jax.random.key(3))
    aot = str(tmp_path / "aot")
    T, V = cfg.duett.n_timesteps, cfg.duett.n_variables
    example = {"x_ts": np.zeros((T, 2 * V), np.float32),
               "static": np.zeros(cfg.duett.d_static, np.float32),
               "pixel_u8": np.zeros((S_IMG, S_IMG, 3), np.uint8)}
    reqs = _requests(cfg, 3, seed=7)
    want = _direct_logits(model, variables, reqs, cfg)

    import os

    def serve_once(expect_hits):
        pred = BatchingPredictor(
            model, variables["params"], variables["batch_stats"],
            max_batch=4, max_wait_ms=5.0, dtype=jnp.float32,
            aot_dir=aot).start()
        try:
            pred.warmup(example)
            assert set(pred._compiled) == set(pred.buckets)
            assert pred.aot_hits == {b: expect_hits for b in pred.buckets}
            got = np.stack([np.asarray(pred.predict(r)["fusion_logits"])
                            for r in reqs])
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        finally:
            pred.close()

    serve_once(expect_hits=False)                  # cold: compile + persist
    files = [f for f in os.listdir(aot) if f.endswith(".aotx")]
    assert len(files) == 3                          # buckets (1, 2, 4)
    serve_once(expect_hits=True)                   # warm: load, no compile


@pytest.mark.slow
def test_aot_warmup_mesh_mode(tmp_path):
    """AOT persistence composes with DP-mesh serving: the recorded device
    set is the mesh's, and a reload serves identical results."""
    from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
    cfg = tiny_cfg()
    model = TeacherModel(cfg)
    variables = init_teacher(model, cfg, 4, cfg.duett.n_timesteps,
                             jax.random.key(5))
    mesh = meshlib.create_mesh(4, 2)
    params = meshlib.shard_params(variables["params"], mesh)
    aot = str(tmp_path / "aot")
    T, V = cfg.duett.n_timesteps, cfg.duett.n_variables
    example = {"x_ts": np.zeros((T, 2 * V), np.float32),
               "static": np.zeros(cfg.duett.d_static, np.float32),
               "pixel_u8": np.zeros((S_IMG, S_IMG, 3), np.uint8)}
    reqs = _requests(cfg, 4, seed=9)
    want = _direct_logits(model, variables, reqs, cfg)
    for expect_hits in (False, True):
        pred = BatchingPredictor(
            model, params, variables["batch_stats"], max_batch=4,
            max_wait_ms=5.0, dtype=jnp.float32, mesh=mesh,
            aot_dir=aot).start()
        try:
            pred.warmup(example)
            assert pred.aot_hits == {b: expect_hits for b in pred.buckets}
            got = np.stack([np.asarray(pred.predict(r)["fusion_logits"])
                            for r in reqs])
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        finally:
            pred.close()


@pytest.mark.slow   # >30 s on the 1-core host
def test_aot_stale_executable_falls_back_to_recompile(tmp_path, monkeypatch):
    """A cache-LOADED executable that fails at execution time (stale .aotx —
    e.g. XLA:CPU AOT machine-feature mismatch after a host migration) must
    be replaced by a fresh compile during warmup, with the cache entry
    overwritten (utils/aot.py force=True): serving never goes down on a bad
    cache file."""
    cfg = tiny_cfg()
    model = TeacherModel(cfg)
    variables = init_teacher(model, cfg, 4, cfg.duett.n_timesteps,
                             jax.random.key(5))
    from multimodal_edema_prediction_tpu.utils import aot as aot_mod
    real = aot_mod.load_or_compile
    calls = {"n": 0}

    class _Stale:
        def __call__(self, *a, **k):
            raise RuntimeError("stale AOT executable (simulated)")

    def fake(lowered, cache_dir, force=False):
        calls["n"] += 1
        if calls["n"] == 1 and not force:
            return _Stale(), True       # pretend hit with a broken payload
        return real(lowered, cache_dir, force=force)

    monkeypatch.setattr(aot_mod, "load_or_compile", fake)
    T, V = cfg.duett.n_timesteps, cfg.duett.n_variables
    example = {"x_ts": np.zeros((T, 2 * V), np.float32),
               "static": np.zeros(cfg.duett.d_static, np.float32),
               "pixel_u8": np.zeros((S_IMG, S_IMG, 3), np.uint8)}
    pred = BatchingPredictor(
        model, variables["params"], variables["batch_stats"],
        max_batch=2, max_wait_ms=5.0, dtype=jnp.float32,
        aot_dir=str(tmp_path / "aot")).start()
    try:
        pred.warmup(example)                       # must not raise
        assert pred.aot_hits[pred.buckets[0]] is False   # fell back
        assert calls["n"] >= 2                     # force-recompile happened
        res = pred.predict(example)
        assert np.isfinite(res["fusion_logits"]).all()
    finally:
        pred.close()
