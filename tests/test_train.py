"""Training-infra tests: AdamW vs torch numerics, schedules, grad accum
equivalence, and the full sharded train step on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tae_tpu.models.tae import TAE, TAEConfig
from tae_tpu.parallel import batch_sharding, make_mesh, param_shardings, shard_params
from tae_tpu.train import TrainState, adamw, epoch_step_lr, make_train_step, step_lr
from tae_tpu.utils.dtypes import FP32

TINY = dict(img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
            decoder_embed_dim=64, decoder_depth=2, decoder_num_heads=4, vocab_size=16)


def test_adamw_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    b0 = rng.standard_normal(3).astype(np.float32)
    grads_seq = [
        {"w": rng.standard_normal((4, 3)).astype(np.float32),
         "b": rng.standard_normal(3).astype(np.float32)}
        for _ in range(5)
    ]

    # torch: decay on 2-D weight only (add_weight_decay semantics)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.AdamW(
        [{"params": [tb], "weight_decay": 0.0},
         {"params": [tw], "weight_decay": 0.05}],
        lr=1e-3, betas=(0.9, 0.95))
    for g in grads_seq:
        tw.grad = torch.from_numpy(g["w"].copy())
        tb.grad = torch.from_numpy(g["b"].copy())
        opt.step()

    # ours
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    o = adamw(weight_decay=0.05)
    state = o.init(params)
    for g in grads_seq:
        params, state = o.update(params, state, jax.tree.map(jnp.asarray, g),
                                 jnp.float32(1e-3))
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(),
                               atol=1e-6, rtol=1e-5)


def test_schedules():
    s = step_lr(1e-4, 1e-5, switch_it=450_000)
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(449_999)) == pytest.approx(1e-4)
    assert float(s(450_000)) == pytest.approx(1e-5)
    e = epoch_step_lr(0.01, step_size=90, gamma=0.1)
    assert float(e(0)) == pytest.approx(0.01)
    assert float(e(89)) == pytest.approx(0.01)
    assert float(e(90)) == pytest.approx(0.001, rel=1e-5)


def _tiny_setup():
    model = TAE(TAEConfig(**TINY))
    params = model.init(jax.random.key(0))
    loss_fn = lambda p, b: (model.forward(p, b, policy=FP32)[0], {})  # noqa: E731
    return model, params, loss_fn


def test_train_step_reduces_loss():
    model, params, loss_fn = _tiny_setup()
    opt = adamw()
    step = jax.jit(make_train_step(loss_fn, opt, step_lr(1e-3, 1e-4, 100)))
    state = TrainState.create(params, opt)
    batch = jax.random.normal(jax.random.key(1), (4, 3, 32, 32))
    losses = []
    for it in range(5):
        state, metrics = step(state, batch, jnp.int32(it))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_grad_accum_matches_full_batch():
    _, params, loss_fn = _tiny_setup()
    # large eps keeps the first AdamW update ~linear in the gradient, so the
    # parameter comparison is well-conditioned (with default eps the step-1
    # update is ~lr*sign(g), unstable to 1e-7 reduction-order noise)
    opt = adamw(eps=1.0)
    sched = step_lr(1e-3, 1e-3, 10)
    step1 = jax.jit(make_train_step(loss_fn, opt, sched, accum_iter=1))
    step2 = jax.jit(make_train_step(loss_fn, opt, sched, accum_iter=2))
    batch = jax.random.normal(jax.random.key(2), (4, 3, 32, 32))
    s1, m1 = step1(TrainState.create(params, opt), batch, jnp.int32(0))
    s2, m2 = step2(TrainState.create(params, opt), batch, jnp.int32(0))
    # microbatch losses average to the full-batch loss; grads & params match
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_train_step_dp_fsdp_tp():
    """Full train step jitted over a 2x2x2 (data, fsdp, tensor) mesh of
    virtual CPU devices — multi-chip correctness without chips."""
    model, params, loss_fn = _tiny_setup()
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    sharded = shard_params(params, mesh)
    # qkv weight really is tensor-sharded on its output dim
    qkv_shard = sharded["encoder"]["blocks"]["attn"]["qkv"]["w"].sharding
    assert qkv_shard.spec[-1] == "tensor"

    opt = adamw()
    state = TrainState.create(sharded, opt)
    step = jax.jit(make_train_step(loss_fn, opt, step_lr(1e-3, 1e-4, 100)))
    batch = jax.device_put(jax.random.normal(jax.random.key(3), (8, 3, 32, 32)),
                           batch_sharding(mesh))
    state, metrics = step(state, batch, jnp.int32(0))
    state, metrics2 = step(state, batch, jnp.int32(1))
    assert np.isfinite(float(metrics2["loss"]))
    assert float(metrics2["loss"]) < float(metrics["loss"])

    # sharded result == single-device result
    opt2 = adamw()
    ref_step = jax.jit(make_train_step(loss_fn, opt2, step_lr(1e-3, 1e-4, 100)))
    ref_state, ref_metrics = ref_step(TrainState.create(params, opt2),
                                      jax.device_put(batch, jax.devices()[0]),
                                      jnp.int32(0))
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_metrics["loss"]),
                               rtol=1e-5)


def test_param_sharding_rules_respect_divisibility():
    """vocab-16 projections can't split 16 over an 8-way axis combination —
    rules must fall back to replication rather than crash."""
    model = TAE(TAEConfig(**{**TINY, "vocab_size": 6}))  # 6 divides nothing
    params = model.init(jax.random.key(0))
    mesh = make_mesh(data=1, fsdp=4, tensor=2)
    shardings = param_shardings(params, mesh)
    spec = shardings["encoder"]["dict_proj"]["w"].spec
    # in-dim 64 divisible by 4 -> fsdp there or replicated; out-dim 6 never sharded
    assert len(spec) == 0 or spec[-1] is None


def test_fsdp_placement_matches_scaling_md():
    """Placement-level scaling audit (docs/SCALING.md §"Training memory
    math"): build the real p32/p64/p128 param trees *abstractly* via
    eval_shape, apply param_shardings, and assert the per-device fp32-Adam
    train-state footprint (16 bytes/param = 4x the fp32 param tree; params
    + grads + two moments all carry the param sharding) matches the table's
    ``16·P / fsdp`` recipe within 5% — i.e. the fallback-to-replication
    rules lose almost nothing at scale, without allocating multi-GB trees."""
    from tae_tpu import models

    GB = 1024 ** 3
    cases = [  # (config, fsdp, params P, SCALING.md per-device GB at 16·P/fsdp)
        ("tae_patch32_vocab1024_px256", 4, 1.83e9),
        ("tae_patch64_vocab4096_px256", 4, 3.37e9),
        ("tae_patch128_vocab4096_px256", 8, 3.72e9),
    ]
    for name, fsdp, p_expected in cases:
        model = models.create(name)
        shapes = jax.eval_shape(model.init, jax.random.key(0))
        leaves = jax.tree.leaves(shapes)
        p_actual = sum(int(np.prod(l.shape)) for l in leaves)
        # the param counts behind the table (tested vs torch meta-device
        # elsewhere) — 2% slack for the docs' rounding
        assert abs(p_actual - p_expected) / p_expected < 0.02, (name, p_actual)

        mesh = make_mesh(data=8 // fsdp, fsdp=fsdp, tensor=1)
        shardings = param_shardings(shapes, mesh)
        per_dev = sum(
            int(np.prod(s.shard_shape(l.shape))) * 4
            for l, s in zip(leaves, jax.tree.leaves(shardings)))
        state_per_dev = 4 * per_dev  # params + grads + mu + nu, all fp32
        predicted = 16 * p_actual / fsdp
        ratio = state_per_dev / predicted
        assert 1.0 <= ratio < 1.05, (
            f"{name}: {state_per_dev / GB:.2f} GB/device vs SCALING.md "
            f"{predicted / GB:.2f} (ratio {ratio:.3f})")


def test_dynamic_loss_scale():
    from tae_tpu.train.scaler import DynamicLossScale, ScalerState

    scaler = DynamicLossScale(growth_interval=2)
    state = ScalerState.create(init_scale=8.0)
    loss = jnp.float32(2.0)
    assert float(scaler.scale(state, loss)) == 16.0

    grads = {"w": jnp.asarray([8.0, 16.0])}
    g, state, finite = scaler.unscale_and_update(state, grads)
    assert bool(finite)
    np.testing.assert_allclose(np.asarray(g["w"]), [1.0, 2.0])
    assert float(state.scale) == 8.0 and int(state.growth_tracker) == 1

    # second finite step hits growth_interval -> scale doubles
    g, state, finite = scaler.unscale_and_update(state, grads)
    assert float(state.scale) == 16.0 and int(state.growth_tracker) == 0

    # non-finite grads -> zeroed grads, halved scale, tracker reset
    bad = {"w": jnp.asarray([jnp.inf, 1.0])}
    g, state, finite = scaler.unscale_and_update(state, bad)
    assert not bool(finite)
    np.testing.assert_allclose(np.asarray(g["w"]), [0.0, 0.0])
    assert float(state.scale) == 8.0


def test_meters_and_jsonl(tmp_path):
    import json

    from tae_tpu.utils.meters import MetricLogger, SmoothedValue, append_jsonl

    m = SmoothedValue(window_size=3)
    for v in [1.0, 2.0, 3.0, 4.0]:
        m.update(v)
    assert m.value == 4.0 and m.max == 4.0
    assert m.avg == pytest.approx(3.0)      # window [2,3,4]
    assert m.global_avg == pytest.approx(2.5)
    assert m.median == pytest.approx(3.0)

    logger = MetricLogger()
    logger.update(loss=1.5)
    logger.update(n=4, acc1=50.0)
    assert logger.loss.global_avg == 1.5
    assert logger.acc1.count == 4
    assert "loss" in str(logger)

    append_jsonl(tmp_path / "log.txt", {"a": 1})
    append_jsonl(tmp_path / "log.txt", {"a": 2})
    lines = (tmp_path / "log.txt").read_text().strip().splitlines()
    assert [json.loads(l)["a"] for l in lines] == [1, 2]


def test_device_metric_ring():
    """DeviceMetricRing returns exact per-iteration values, in order, one
    drain per window (or on force/final drain) — the relay-friendly
    replacement for per-iter device_get in all trainer CLIs."""
    from tae_tpu.utils.meters import DeviceMetricRing

    ring = DeviceMetricRing(("loss", "lr"), window=3)
    got = []
    for it in range(7):
        m = {"loss": jnp.float32(it * 1.5), "lr": jnp.float32(it),
             "extra": jnp.float32(-1.0)}  # extra keys must be ignored
        drained = ring.push(it, m, force=(it == 4))
        if it in (2, 4):                   # window fill at 2; forced at 4
            assert [p for p, _ in drained] == ([0, 1, 2] if it == 2 else [3, 4])
        else:
            assert drained == []
        got.extend(drained)
    got.extend(ring.drain())               # final partial drain: [5, 6]
    assert ring.drain() == []              # idempotent when empty
    assert [p for p, _ in got] == list(range(7))
    for p, vals in got:
        assert vals == {"loss": pytest.approx(p * 1.5), "lr": pytest.approx(p)}


def test_device_metric_ring_consume_protocol():
    """ring.consume is the shared drain protocol all four trainer CLIs use:
    rows reach on_row in iteration order, and a non-finite loss exits the
    process (the reference's per-step abort, train.py:141-143, deferred by
    at most one window)."""
    from tae_tpu.utils.meters import DeviceMetricRing

    ring = DeviceMetricRing(("loss",), window=2)
    rows = []
    ring.consume(ring.push(0, {"loss": jnp.float32(0.5)}),
                 lambda pit, vals: rows.append((pit, vals["loss"])))
    ring.consume(ring.push(1, {"loss": jnp.float32(1.5)}),
                 lambda pit, vals: rows.append((pit, vals["loss"])))
    assert rows == [(0, pytest.approx(0.5)), (1, pytest.approx(1.5))]

    ring.push(2, {"loss": jnp.float32(float("nan"))})
    with pytest.raises(SystemExit) as e:
        ring.consume(ring.drain(), lambda *_: rows.append("unreachable"))
    assert e.value.code == 1
    assert "unreachable" not in rows


def test_log_every_and_profiling(tmp_path, capsys):
    from tae_tpu.utils.meters import MetricLogger
    from tae_tpu.utils import profiling

    logger = MetricLogger()
    seen = []
    for x in logger.log_every(range(7), print_freq=3, header="T:"):
        logger.update(loss=float(x))
        seen.append(x)
    assert seen == list(range(7))
    out = capsys.readouterr().out
    assert "T: [0/7]" in out and "Total time" in out and "loss" in out

    # profiler trace context produces a capture dir; memory_stats is well-formed
    with profiling.trace(tmp_path / "trace"):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert any((tmp_path / "trace").rglob("*")), "no trace output written"
    stats = profiling.memory_stats()
    assert isinstance(stats, dict)
    key = profiling.fix_random_seeds(3)
    assert key is not None


def test_xprof_top_ops_parses_trace(tmp_path, capsys):
    """First-party xplane parsing: trace a jitted computation, get a
    per-op duration table (the tensorboard converter chain is broken by
    version skew; this is the analysis path that found the attention-kernel
    win, docs/KERNELS.md)."""
    import jax

    from tae_tpu.utils import xprof

    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    x = jnp.ones((128, 128))
    float(f(x))  # compile outside the trace
    with xprof.trace(str(tmp_path / "tr")):
        float(f(x))
    rows = xprof.top_ops(str(tmp_path / "tr"))
    assert rows and all({"name", "total_ms", "count", "share"} <= set(r)
                        for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-6 or len(rows) == 25
    xprof.print_top_ops(str(tmp_path / "tr"))
    assert "share" in capsys.readouterr().out


def test_int8_param_sharding_mirrors_float_rules():
    """Quantized w_q/w_scale leaves shard like their float counterparts and
    a quantized encoder executes under GSPMD on the mesh."""
    from tae_tpu.ops.int8 import quantize_params

    model = TAE(TAEConfig(**TINY))
    params = model.init(jax.random.key(0))
    qp = quantize_params(params)
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    sh = param_shardings(qp, mesh)
    blk = sh["encoder"]["blocks"]
    # stacked (depth, in, out): trailing dims follow the float rules
    assert blk["attn"]["qkv"]["w_q"].spec == (None, "fsdp", "tensor")
    assert blk["attn"]["qkv"]["w_scale"].spec == (None, "tensor")
    assert blk["mlp"]["fc2"]["w_q"].spec == (None, "tensor", "fsdp")

    qp = jax.device_put(qp, sh)
    imgs = jax.random.normal(jax.random.key(1), (8, 3, TINY["img_size"],
                                                 TINY["img_size"]))
    from tae_tpu.parallel import batch_sharding
    imgs = jax.device_put(imgs, batch_sharding(mesh))
    z = jax.jit(lambda p, x: model.forward_encoder(p, x, policy=FP32))(qp, imgs)
    assert np.isfinite(np.asarray(z, np.float32)).all()


def _compile_seg_step_capturing_warnings(head_sharding=None) -> str:
    """Compile the sharded segmentation train step on a (2,2,2) mesh with
    the XLA/C++ warning stream captured at the fd level; returns the
    captured text. ``head_sharding`` overrides the head/aux_head weight
    sharding (used for the positive control below)."""
    import os
    import sys
    import tempfile

    from tae_tpu.cli.train_segmentation import criterion
    from tae_tpu.models.segmentation import SegmentationConfig, SegmentationViT

    cfg = SegmentationConfig(num_patches=4, patch_size=16, vocab_size=16,
                             decoder_embed_dim=64, decoder_depth=2,
                             decoder_num_heads=4, num_classes=5)
    seg = SegmentationViT(cfg)
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    params = shard_params(seg.init(jax.random.key(0)), mesh)
    if head_sharding is not None:
        sh = jax.sharding.NamedSharding(mesh, head_sharding)
        for k in ("head", "aux_head"):
            params[k]["w"] = jax.device_put(np.asarray(params[k]["w"]), sh)
    else:
        # the fix under test: heads fsdp-sharded on the INPUT dim (ZeRO
        # resolution — weight gather + grad reduce-scatter, activations
        # stay batch-sharded), never on the output dim
        assert params["head"]["w"].sharding.spec == ("fsdp", None)
        assert params["aux_head"]["w"].sharding.spec == ("fsdp", None)

    opt = adamw()
    state = TrainState.create(params, opt)

    def loss_fn(p, b):
        z, masks = b
        out = seg.forward(p, z, policy=FP32, mesh=mesh)
        return criterion(out, masks), {}

    step = jax.jit(make_train_step(loss_fn, opt, step_lr(1e-3, 1e-4, 100)))
    side = cfg.patch_size * int(np.sqrt(cfg.num_patches))
    z = jax.device_put(
        jax.random.normal(jax.random.key(1), (8, cfg.num_patches,
                                              cfg.vocab_size)),
        batch_sharding(mesh))
    masks = jnp.tile(jnp.arange(side, dtype=jnp.int32) % cfg.num_classes,
                     (8, side, 1)).at[:, 0].set(255)
    masks = jax.device_put(masks, batch_sharding(mesh))

    # a persistent-compilation-cache hit would skip the SPMD partitioner
    # entirely and emit no warning — force a real compile for the capture
    prev_cache = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        with tempfile.TemporaryFile() as cap:
            sys.stderr.flush()
            saved = os.dup(2)
            os.dup2(cap.fileno(), 2)
            try:
                compiled = step.lower(state, (z, masks), jnp.int32(0)).compile()
            finally:
                sys.stderr.flush()
                os.dup2(saved, 2)
                os.close(saved)
            cap.seek(0)
            text = cap.read().decode(errors="replace")
    finally:
        jax.config.update("jax_enable_compilation_cache", prev_cache)
    if head_sharding is None:
        state, m = compiled(state, (z, masks), jnp.int32(0))
        assert np.isfinite(float(m["loss"]))
    return text


def test_seg_train_step_partitions_without_full_remat():
    """VERDICT r4 item 3, machine-checked: the segmentation train step must
    partition onto a (data, fsdp, tensor) mesh with weights/grads-only
    communication — no "involuntary full rematerialization" from the GSPMD
    partitioner. The r3/r4 dryruns paid a per-step all-gather + re-slice on
    the head outputs around the dim-mixing unpatchify because the head
    weight's OUTPUT-dim fsdp sharding made the backward prefer
    channel-sharded dout (reference DDP communicates only bucketed grads,
    reference train.py:102; fixed by input-dim head sharding,
    parallel/sharding.py rules). Self-validating: a positive control
    compiles the pre-fix output-dim sharding first and must reproduce the
    warning — if the warning stream is not observable in this environment
    (e.g. TF_CPP_MIN_LOG_LEVEL>=2) the test skips rather than passing
    vacuously."""
    control = _compile_seg_step_capturing_warnings(
        head_sharding=jax.sharding.PartitionSpec(None, "fsdp"))
    if "full rematerialization" not in control:
        pytest.skip("XLA spmd_partitioner warnings not observable here — "
                    "cannot machine-check the full-remat criterion")

    text = _compile_seg_step_capturing_warnings()
    assert "full rematerialization" not in text, (
        "GSPMD resolved a sharding conflict with an involuntary full "
        "rematerialization:\n" + text[-3000:])


def test_head_sharding_rule_and_quantized_mirror():
    """Dense heads shard fsdp on the input dim (never the output dim — the
    full-remat trigger), and their int8 w_q/w_scale leaves mirror the float
    rule (the file header's invariant; reviewed r5)."""
    from tae_tpu import models
    from tae_tpu.ops.int8 import quantize_params

    model = models.create("vit_recognition_numpatches256_vocab256_base",
                          num_classes=10)
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    shapes = jax.eval_shape(model.init, jax.random.key(0))
    sh = param_shardings(shapes, mesh)
    assert sh["head"]["w"].spec == ("fsdp", None)

    seg = models.create("vit_segmentation_numpatches4_vocab4096_base")
    # the 264M-param patch-128 head: input dim sharded, never replicated
    shapes = jax.eval_shape(seg.init, jax.random.key(0))
    sh = param_shardings(shapes, mesh)
    assert sh["head"]["w"].spec == ("fsdp", None)
    assert sh["aux_head"]["w"].spec == ("fsdp", None)

    qshapes = jax.eval_shape(
        lambda k: quantize_params(model.init(k)), jax.random.key(0))
    qsh = param_shardings(qshapes, mesh)
    assert qsh["head"]["w_q"].spec == ("fsdp", None)
    assert len(qsh["head"]["w_scale"].spec) <= 1
