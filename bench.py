"""Benchmark: PAD-UFES-20-shaped fit+predict throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Config matches the reference protocol (SURVEY.md §6): 2298 rows (80/20 split),
21 clinical features + 1 frozen image-embedding token, MGM+CAP mixer,
n_estimators=4, full TabPFN-v2 architecture. `vs_baseline` compares against the
torch reference on the same config measured by tools/measure_reference_baseline.py
(recorded in bench_baseline.json).

`extra` carries the honest engineering numbers:
  * ``train_step_ms`` / ``train_step_tflops`` / ``mfu`` — steady-state fine-tune
    step (fwd+bwd+optimizer, bf16, flash kernels) at the PAD-UFES episode shape,
    timed latency-free by chaining steps inside one jit (the axon tunnel adds
    ~30ms per host sync, which would swamp a per-step timing); FLOPs from XLA
    cost analysis; MFU vs the chip's bf16 peak.
  * ``finetune_100steps_s`` — wall-clock of the reference fine-tuning protocol
    (100 steps + per-step validation, bs 1, frozen input encoders) vs the
    reference's measured 167.6 s on a CUDA GPU (BASELINE.md row 11);
    ``finetune_100steps_warm_s`` re-runs it with another seed in-process
    (memoized programs — the HPO driver's regime after its first trial).

Steady-state protocol: one warmup fit+predict (pays compile), then timed fresh
fit+predict epochs with identical shapes (compile-cached, as in production reuse).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np

BENCH_MGM, BENCH_CAP, BENCH_EST = 16, 8, 4

# bf16 peak FLOP/s by device kind (dense MXU)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def kernel_parity_metrics(
    tol_f32: float = 1e-4,
    tol_bf16: float = 3e-2,
    *,
    feat_shape: tuple[int, int, int] = (2, 96, 31),  # (b, s, t)
    item_shape: tuple[int, int, int] = (12, 768, 128),  # (lead, sep, s_te)
) -> dict:
    """On-hardware Pallas-vs-XLA numerical parity gate (round-5 verdict #3).

    Every Pallas kernel test runs in interpret mode on CPU, so a Mosaic
    lowering regression ships silently — round 5 found exactly that (the
    round-4 masked feature-attention kernel's (1, t8) mask BlockSpec never
    lowered on a real TPU). This gate runs each production kernel against its
    XLA formulation ON THE REAL CHIP at a representative shape:

      * fused feature-attention+LN — sample-major, item-major, and the
        per-member masked (cross-width) variants, fwd and custom-vjp bwd
      * fused MLP+LN, fwd + bwd
      * flash (transposed-layout) two-block item attention, fwd + bwd
      * the fully-fused item sublayer (in-kernel projections + flash +
        out-proj + residual + LN), fwd + bwd
      * the flash path at the production dtype (bf16), looser tolerance

    f32 comparisons run under highest matmul precision; error metric is
    max|pallas − xla| / max|xla|. Any kernel over tolerance sets
    ``kernel_parity_ok: false`` (bench exits nonzero after printing)."""
    import jax
    import jax.numpy as jnp

    from multimodalpfn_tpu.ops.attention import item_attention, self_attention
    from multimodalpfn_tpu.ops.pallas_fused import (
        fused_feature_attention_ln,
        fused_feature_attention_ln_im,
        fused_mlp_ln,
    )
    from multimodalpfn_tpu.ops.pallas_item_fused import fused_item_sublayer

    e, h, d, nhid = 192, 6, 32, 768
    b, s, t = feat_shape
    lead, sep, ste = item_shape
    rng = np.random.default_rng(7)
    wqkv = jnp.asarray(rng.normal(size=(3, h, d, e)) * 0.05, jnp.float32)
    wout = jnp.asarray(rng.normal(size=(h, d, e)) * 0.05, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(e, nhid)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(nhid, e)) * 0.05, jnp.float32)
    x_feat = jnp.asarray(rng.normal(size=(b, s, t, e)), jnp.float32)
    mask = np.ones((b, t), bool)
    mask[b - 1, (2 * t) // 3:] = False  # last member masks its padded tail
    mask_j = jnp.asarray(mask)
    x_item = jnp.asarray(rng.normal(size=(lead, sep + ste, e)), jnp.float32)
    cot_feat = jnp.asarray(rng.normal(size=x_feat.shape), jnp.float32)
    cot_item = jnp.asarray(rng.normal(size=x_item.shape), jnp.float32)

    def ln(u):
        m = jnp.mean(u, axis=-1, keepdims=True)
        v = jnp.mean((u - m) ** 2, axis=-1, keepdims=True)
        return (u - m) * jax.lax.rsqrt(v + 1e-5)

    def rel(a, b_):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        return float(np.abs(a - b_).max() / (np.abs(b_).max() + 1e-30))

    def grads_of(fn, *args, cot):
        def loss(*a):
            return jnp.sum(fn(*a).astype(jnp.float32) * cot)

        return jax.grad(loss, argnums=tuple(range(len(args))))(*args)

    errs: dict[str, float] = {}
    with jax.default_matmul_precision("highest"):
        # --- fused feature attention + LN (sample-major + masked) ---
        def xla_feat(xx, km=None):
            km4 = None if km is None else km[:, None, None, None, :]
            return ln(xx + self_attention(xx, wqkv, wout, key_mask=km4))

        fused = jax.jit(lambda xx: fused_feature_attention_ln(xx, wqkv, wout))
        ref = jax.jit(xla_feat)
        errs["feat_attn_fwd"] = rel(fused(x_feat), ref(x_feat))
        g_f = jax.jit(lambda xx, w, wo: grads_of(
            fused_feature_attention_ln, xx, w, wo, cot=cot_feat))(x_feat, wqkv, wout)
        g_r = jax.jit(lambda xx, w, wo: grads_of(
            lambda a, b2, c: ln(a + self_attention(a, b2, c)), xx, w, wo,
            cot=cot_feat))(x_feat, wqkv, wout)
        errs["feat_attn_bwd"] = max(rel(a, b2) for a, b2 in zip(g_f, g_r))
        errs["feat_attn_masked_fwd"] = rel(
            jax.jit(lambda xx: fused_feature_attention_ln(
                xx, wqkv, wout, key_mask=mask_j[:, None, :]))(x_feat),
            jax.jit(lambda xx: xla_feat(xx, mask_j))(x_feat),
        )
        # --- item-major layout (+ masked) ---
        x_im = jnp.swapaxes(x_feat, 1, 2)
        errs["feat_attn_im_fwd"] = rel(
            jax.jit(lambda xx: fused_feature_attention_ln_im(xx, wqkv, wout))(x_im),
            jnp.swapaxes(ref(x_feat), 1, 2),
        )
        errs["feat_attn_im_masked_fwd"] = rel(
            jax.jit(lambda xx: fused_feature_attention_ln_im(
                xx, wqkv, wout, key_mask=mask_j))(x_im),
            jnp.swapaxes(jax.jit(lambda xx: xla_feat(xx, mask_j))(x_feat), 1, 2),
        )
        # --- fused MLP + LN ---
        def xla_mlp(xx):
            hh = jax.nn.gelu(xx @ w1, approximate=False)
            return ln(xx + hh @ w2)

        errs["mlp_fwd"] = rel(
            jax.jit(lambda xx: fused_mlp_ln(xx, w1, w2))(x_feat),
            jax.jit(xla_mlp)(x_feat),
        )
        g_f = jax.jit(lambda xx, a, b2: grads_of(fused_mlp_ln, xx, a, b2,
                                                 cot=cot_feat))(x_feat, w1, w2)
        g_r = jax.jit(lambda xx, a, b2: grads_of(
            lambda u, v, w: ln(u + jax.nn.gelu(u @ v, approximate=False) @ w),
            xx, a, b2, cot=cot_feat))(x_feat, w1, w2)
        errs["mlp_bwd"] = max(rel(a, b2) for a, b2 in zip(g_f, g_r))

        # --- flash two-block item attention (fwd + bwd) ---
        def item(xx, use_flash):
            return item_attention(
                xx, wqkv, wout, single_eval_pos=sep, use_flash=use_flash,
            )

        errs["flash_item_fwd"] = rel(
            jax.jit(lambda xx: item(xx, True))(x_item),
            jax.jit(lambda xx: item(xx, False))(x_item),
        )
        g_f = jax.jit(lambda xx, w, wo: grads_of(
            lambda a, b2, c: item_attention(a, b2, c, single_eval_pos=sep,
                                            use_flash=True),
            xx, w, wo, cot=cot_item))(x_item, wqkv, wout)
        g_r = jax.jit(lambda xx, w, wo: grads_of(
            lambda a, b2, c: item_attention(a, b2, c, single_eval_pos=sep,
                                            use_flash=False),
            xx, w, wo, cot=cot_item))(x_item, wqkv, wout)
        errs["flash_item_bwd"] = max(rel(a, b2) for a, b2 in zip(g_f, g_r))

        # --- fully-fused item sublayer (fwd + bwd) ---
        x_im3 = x_item.reshape(2, lead // 2, sep + ste, e)
        cot_im3 = cot_item.reshape(x_im3.shape)
        errs["item_sublayer_fwd"] = rel(
            jax.jit(lambda xx: fused_item_sublayer(
                xx, wqkv, wout, single_eval_pos=sep,
                compute_dtype=jnp.float32))(x_im3),
            jax.jit(lambda xx: ln(xx + item(xx, False)))(x_im3),
        )
        g_f = jax.jit(lambda xx, w, wo: grads_of(
            lambda a, b2, c: fused_item_sublayer(
                a, b2, c, single_eval_pos=sep, compute_dtype=jnp.float32),
            xx, w, wo, cot=cot_im3))(x_im3, wqkv, wout)
        g_r = jax.jit(lambda xx, w, wo: grads_of(
            lambda a, b2, c: ln(a + item_attention(
                a, b2, c, single_eval_pos=sep, use_flash=False)),
            xx, w, wo, cot=cot_im3))(x_im3, wqkv, wout)
        errs["item_sublayer_bwd"] = max(rel(a, b2) for a, b2 in zip(g_f, g_r))

    # --- production dtype: bf16 flash vs bf16 XLA (accumulations f32) ---
    xb = x_item.astype(jnp.bfloat16)
    errs["flash_item_fwd_bf16"] = rel(
        jax.jit(lambda xx: item_attention(
            xx, wqkv, wout, single_eval_pos=sep, use_flash=True,
            compute_dtype=jnp.bfloat16))(xb).astype(jnp.float32),
        jax.jit(lambda xx: item_attention(
            xx, wqkv, wout, single_eval_pos=sep, use_flash=False,
            compute_dtype=jnp.bfloat16))(xb).astype(jnp.float32),
    )

    tol = {k: (tol_bf16 if k.endswith("bf16") else tol_f32) for k in errs}
    ok = all(v < tol[k] and np.isfinite(v) for k, v in errs.items())
    return {
        "kernel_parity_ok": bool(ok),
        "kernel_parity_rel_err": {k: float(f"{v:.3g}") for k, v in errs.items()},
    }


def fit_predict_throughput(X, emb, y) -> tuple[float, int]:
    from multimodalpfn_tpu import MMPFNClassifier

    ntr = int(len(X) * 0.8)
    n_test = len(X) - ntr

    def run(seed: int) -> float:
        clf = MMPFNClassifier(
            model_path="random:0",
            mixer_type="MGM+CAP",
            mgm_heads=BENCH_MGM,
            cap_heads=BENCH_CAP,
            features_per_group=1,
            n_estimators=BENCH_EST,
            random_state=seed,
        )
        t0 = time.time()
        clf.fit(X[:ntr], emb[:ntr], y[:ntr])
        proba = clf.predict_proba(X[ntr:], emb[ntr:])
        dt = time.time() - t0
        assert proba.shape == (n_test, 6) and np.isfinite(proba).all()
        return dt

    run(0)  # warmup: compile
    # median of 5: the remote-TPU tunnel adds run-to-run variance that a
    # median of 3 does not reliably reject
    times = [run(s) for s in (0, 1, 2, 3, 4)]
    return n_test / float(np.median(times)), n_test


def model_matmul_flops(
    *, e: int, nhead: int, nhid: int, nlayers: int, b: int, s: int, s_tr: int,
    s_te: int, t: int, in_dim: int, mgm: int, cap: int, n_out: int
) -> float:
    """Analytic matmul FLOPs of ONE forward at an episode shape.

    XLA's cost_analysis undercounts here (the layer stack is a lax.scan whose
    body it counts once, and Pallas kernels are custom-calls with no FLOPs
    attributed), so MFU uses this closed form: attention projections, scores,
    PV, out-projection, MLP, mixer, decoder. 2*M*N*K per matmul.
    """
    N = b * s * t  # cells = samples x tokens
    per_layer = 0.0
    # feature-axis attention over t tokens (batch b*s)
    per_layer += 4 * 2 * N * e * e  # q,k,v,out projections
    per_layer += 2 * 2 * b * s * t * t * e  # scores + PV
    # item-axis attention over s samples (batch b*t)
    per_layer += 4 * 2 * N * e * e
    per_layer += 2 * 2 * b * t * (s_tr * s_tr + s_te * s_tr) * e
    # MLP e -> nhid -> e
    per_layer += 2 * 2 * N * e * nhid
    total = nlayers * per_layer
    # mixers: MGM heads (in->in GLU + in/2->e) + CAP cross-attn (~cap queries)
    total += b * s * mgm * 2 * (in_dim * in_dim + (in_dim // 2) * e)
    total += b * s * cap * 2 * 4 * e * e
    # decoder MLP e -> nhid -> n_out on test rows
    total += 2 * b * s_te * e * nhid + 2 * b * s_te * nhid * n_out
    return float(total)


def train_step_mfu(n_chain: int = 8) -> dict:
    """Steady-state fine-tune step time + MFU at the PAD-UFES episode shape."""
    import jax
    import jax.numpy as jnp

    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.params import init_params
    from multimodalpfn_tpu.train.losses import get_loss_fn
    from multimodalpfn_tpu.train.step import (
        frozen_input_mask,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    on_accel = jax.devices()[0].platform not in ("cpu",)
    cfg = ModelConfig(
        emsize=192,
        nhead=6,
        nhid_factor=4,
        nlayers=12,
        features_per_group=1,
        n_out=10,
        max_num_classes=10,
        compute_dtype="bfloat16" if on_accel else "float32",
        use_flash=on_accel,
        fused_ops=on_accel,
        mixer=MixerConfig(
            mixer_type="MGM+CAP", mgm_heads=BENCH_MGM, cap_heads=BENCH_CAP, in_dim=768
        ),
    )
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    # PAD-UFES fine-tune episode: 9/10 : 1/10 K-fold of the 1470-row train split
    b, s_tr, s_te, F = 1, 1323, 147, 21
    rng = np.random.default_rng(0)
    batch = {
        "x_train": rng.normal(size=(b, s_tr, F)).astype(np.float32),
        "y_train": rng.integers(0, 6, size=(b, s_tr)).astype(np.float32),
        "x_test": rng.normal(size=(b, s_te, F)).astype(np.float32),
        "y_test": rng.integers(0, 6, size=(b, s_te)).astype(np.float32),
        "image_train": rng.normal(size=(b, s_tr, 1, 768)).astype(np.float32),
        "image_test": rng.normal(size=(b, s_te, 1, 768)).astype(np.float32),
    }
    loss_fn = get_loss_fn("multiclass")
    tx = make_optimizer(1e-5, freeze_mask=frozen_input_mask(params, True))
    state = init_train_state(params, tx)
    step = make_train_step(cfg, loss_fn, tx, remat=True, donate=False)

    def step_fn(st, _):
        st, metrics = step.__wrapped__(st, batch, jax.random.PRNGKey(1))
        return st, metrics["loss"]

    import jax as _jax

    def chain(n):
        @_jax.jit
        def run(st):
            st, losses = _jax.lax.scan(step_fn, st, None, length=n)
            return losses[-1]

        return run

    f1, fn = chain(1), chain(1 + n_chain)
    float(f1(state)), float(fn(state))  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(f1(state))
        t1 = time.time()
        float(fn(state))
        ts.append((time.time() - t1) - (t1 - t0))
    dt = float(np.median(ts)) / n_chain

    # MFU convention: 3x forward model-FLOPs per train step (fwd + bwd);
    # rematerialization recompute is NOT credited.
    fwd_flops = model_matmul_flops(
        e=cfg.emsize, nhead=cfg.nhead, nhid=cfg.nhid, nlayers=cfg.nlayers,
        b=b, s=s_tr + s_te, s_tr=s_tr, s_te=s_te,
        t=F + BENCH_CAP + 1, in_dim=768, mgm=BENCH_MGM, cap=BENCH_CAP,
        n_out=cfg.n_out,
    )
    flops = 3.0 * fwd_flops
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, 197e12)
    return {
        "train_step_ms": round(dt * 1e3, 2),
        "train_step_model_tflops": round(flops / 1e12, 3),
        "achieved_tflops_per_s": round(flops / dt / 1e12, 2),
        "mfu": round(flops / dt / peak, 4),
        "device_kind": kind,
    }


def sweep_metrics(
    n_runs: int = 4,
    n_steps: int = 20,
    *,
    emsize: int = 192,
    nhead: int = 6,
    nlayers: int = 12,
    shape: tuple[int, int, int, int] = (1, 1323, 147, 21),
    n_reps: int = 3,
    mgm_list: tuple[int, ...] | None = None,
) -> dict:
    """North-star sweep regime: N independent fine-tune runs resident on one
    chip, advancing as ONE vmapped step stream (`train/finetune_batch.py`,
    BASELINE.json config 5 — replaces the reference's `run0.sh`/`run1.sh`
    process queues). Reports aggregate run-steps/s and aggregate MFU.

    Same compiled program as `fine_tune_batched_cells`: episodes gathered on
    device from the resident per-run train split (~KB index uploads per
    dispatch), vmapped value_and_grad + optimizer over stacked per-run params,
    fused kernels, and the SAME remat on/off decision production makes
    (`finetune_batch.sweep_use_remat` — remat off at n_runs=4 where the
    un-rematerialized activations fit HBM and the step is ~35% faster; the
    decision taken is reported as ``sweep_remat``). Timed as
    ``n_steps`` back-to-back donated dispatches with ONE device->host fetch at
    the end — what production (`fine_tune_batched_cells`) actually issues per
    episode; dispatches pipeline on the device queue, so per-step wall
    converges to device time (matches the profiler's module time to <1 ms).
    A scan-chained measurement is deliberately NOT used: the scan carry adds
    ~100 ms/step of copy traffic the per-episode production loop never pays.

    ``mgm_list``: per-run ACTIVE mgm_heads for the HETEROGENEOUS cross-cell
    regime (the reference grid sweeps mgm over 2..256 with a shared small cap,
    `configs/pad_ufes_20.yaml:1-4`, so a big batched sweep is necessarily
    mixed-width). Mixer params are padded to max(mgm_list) and a traced
    per-run ``mgm_active`` masks the inactive heads exactly — the same
    program `fine_tune_batched_cells` compiles. MGM+CAP emits cap_heads
    tokens for every run, so the transformer runs the identical fused/flash
    path; only the mixer executes padded width. The reported MFU counts each
    run's ACTIVE model FLOPs (useful work); ``sweep_pad_overhead`` is
    executed/active.
    """
    import jax
    import jax.numpy as jnp

    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.params import (
        init_mixer_params,
        init_params,
        pad_mixer_params,
    )
    from multimodalpfn_tpu.models.transformer import forward_train_test
    from multimodalpfn_tpu.train.losses import get_loss_fn
    from multimodalpfn_tpu.train.finetune_batch import sweep_use_remat
    from multimodalpfn_tpu.train.step import (
        TrainState,
        frozen_input_mask,
        init_train_state,
        make_optimizer,
    )

    on_accel = jax.devices()[0].platform not in ("cpu",)
    hetero = mgm_list is not None
    if hetero:
        assert len(mgm_list) == n_runs
    mgm_max = max(mgm_list) if hetero else BENCH_MGM
    cfg = ModelConfig(
        emsize=emsize, nhead=nhead, nhid_factor=4, nlayers=nlayers,
        features_per_group=1,
        n_out=10, max_num_classes=10,
        compute_dtype="bfloat16" if on_accel else "float32",
        use_flash=on_accel, fused_ops=on_accel,
        mixer=MixerConfig(
            mixer_type="MGM+CAP", mgm_heads=mgm_max, cap_heads=BENCH_CAP,
            in_dim=768,
        ),
    )
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    params_s = jax.tree.map(
        lambda p: jnp.array(jnp.broadcast_to(p, (n_runs, *p.shape))), params
    )
    extras = {}
    if hetero:
        # per-run mixer init at the TRUE head count, padded to the group max —
        # exactly what fine_tune_batched_cells stacks
        import dataclasses as _dc

        mixers = [
            pad_mixer_params(
                init_mixer_params(
                    jax.random.PRNGKey(r),
                    _dc.replace(cfg.mixer, mgm_heads=int(m)),
                    cfg.emsize,
                ),
                cfg.mixer,
            )
            for r, m in enumerate(mgm_list)
        ]
        params_s = dict(params_s)
        params_s["mixer"] = jax.tree.map(lambda *xs: jnp.stack(xs), *mixers)
        extras["mgm_active"] = jnp.asarray(list(mgm_list), jnp.int32)
    b, s_tr, s_te, F = shape
    # the episode gather below (and the protocol, bs=1) is single-batch; a
    # b>1 shape would silently measure b=1 work while crediting b x FLOPs
    assert b == 1, "sweep_metrics measures the bs=1 protocol"
    n_ctx = s_tr + s_te  # resident train split per run; episodes gather from it
    # same remat decision as production's one_step (token-aware heuristic);
    # n_tok proxy = feature groups + image tokens + y token
    use_remat = sweep_use_remat(n_runs, n_ctx, F + 1 + 1)
    rng = np.random.default_rng(0)
    # the run's train split stays RESIDENT (as in fine_tune_batched_cells);
    # each step gathers its episode on device from ~KB uploaded fold indices
    ctx = {
        "x": jnp.asarray(rng.normal(size=(n_runs, b, n_ctx, F)), jnp.float32),
        "y": jnp.asarray(rng.integers(0, 6, size=(n_runs, b, n_ctx)), jnp.float32),
        "img": jnp.asarray(
            rng.normal(size=(n_runs, b, n_ctx, 1, 768)), jnp.float32
        ),
    }
    loss_fn = get_loss_fn("multiclass")
    tx = make_optimizer(1e-5, freeze_mask=frozen_input_mask(params, True))

    def one_step(state, idx_tr, idx_te, key, ex, vd):
        bt = {
            "x_train": vd["x"][0][idx_tr],
            "y_train": vd["y"][0][idx_tr],
            "x_test": vd["x"][0][idx_te],
            "y_test": vd["y"][0][idx_te],
            "image_train": vd["img"][0][idx_tr],
            "image_test": vd["img"][0][idx_te],
        }

        def compute_loss(p):
            logits = forward_train_test(
                p, cfg, bt["x_train"], bt["y_train"], bt["x_test"],
                bt["image_train"], bt["image_test"],
                train=True, rng=key, remat=use_remat,
                mgm_active=ex.get("mgm_active"),
            )
            return loss_fn(logits, bt["y_test"])

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        p = jax.tree.map(lambda a, u: a + u, state.params, updates)
        return TrainState(p, opt_state, state.step + 1), loss

    vstep = jax.jit(jax.vmap(one_step), donate_argnums=(0,))
    keys = jax.random.split(jax.random.PRNGKey(1), n_runs)

    # a few pre-drawn episode index sets, cycled so every dispatch pays the
    # same ~KB host->device index upload the production loop pays
    def draw_idx(seed):
        r = np.random.default_rng(seed)
        perms = np.stack([r.permutation(n_ctx) for _ in range(n_runs)])
        return (
            np.ascontiguousarray(perms[:, None, :s_tr]).astype(np.int32),
            np.ascontiguousarray(perms[:, None, s_tr:]).astype(np.int32),
        )

    idx_sets = [draw_idx(s) for s in range(min(4, max(2, n_steps)))]

    state = jax.vmap(lambda p: init_train_state(p, tx))(params_s)
    state, loss = vstep(state, *idx_sets[0], keys, extras, ctx)
    np.asarray(loss)  # compile
    state, loss = vstep(state, *idx_sets[1], keys, extras, ctx)
    np.asarray(loss)  # warm the dispatch queue
    ts = []
    for rep in range(n_reps):
        t0 = time.time()
        for i in range(n_steps):
            state, loss = vstep(
                state, *idx_sets[i % len(idx_sets)], keys, extras, ctx
            )
        np.asarray(loss)
        ts.append((time.time() - t0) / n_steps)
    dt = float(np.median(ts))
    assert np.isfinite(np.asarray(loss)).all(), "sweep step produced non-finite loss"

    def run_fwd_flops(mgm: int) -> float:
        return model_matmul_flops(
            e=cfg.emsize, nhead=cfg.nhead, nhid=cfg.nhid, nlayers=cfg.nlayers,
            b=b, s=s_tr + s_te, s_tr=s_tr, s_te=s_te,
            t=F + BENCH_CAP + 1, in_dim=768, mgm=mgm, cap=BENCH_CAP,
            n_out=cfg.n_out,
        )

    active_mgm = list(mgm_list) if hetero else [BENCH_MGM] * n_runs
    # MFU counts each run's ACTIVE FLOPs (what its unpadded cell computes);
    # the padded mixer's extra executed work is reported separately
    flops = 3.0 * sum(run_fwd_flops(m) for m in active_mgm)
    executed = 3.0 * run_fwd_flops(mgm_max) * n_runs
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, 197e12)
    out = {
        "sweep_runs": n_runs,
        "sweep_remat": bool(use_remat),
        "sweep_step_ms": round(dt * 1e3, 2),
        # aggregate across the N resident runs (each vmapped dispatch advances
        # every run by one step): N / wall-seconds-per-dispatch
        "sweep_steps_per_s": round(n_runs / dt, 2),
        "sweep_mfu": round(flops / dt / peak, 4),
    }
    if hetero:
        out["sweep_mgm_list"] = list(mgm_list)
        out["sweep_pad_overhead"] = round(executed / flops, 3)
    return out


def cached_predict_flops(
    *, t: int, s_te: int, s_tr: int, e: int, nhid: int, nlayers: int,
) -> float:
    """Analytic matmul FLOPs of one member's KV-cached predict
    (models/cached.py::forward_cached): per layer, feature attention
    (projections + scores over t tokens), the multiquery q-projection +
    cross-attention to the cached single KV head, out-projection, and MLP."""
    per_layer = (
        8 * s_te * t * e * e  # feature-attn projections
        + 4 * s_te * t * t * e  # feature-attn scores + PV
        + 2 * s_te * t * e * e  # item q projection (h*d == e)
        + 4 * t * s_te * s_tr * e  # scores + PV vs cached KV head 0
        + 2 * s_te * t * e * e  # item out-projection
        + 4 * s_te * t * e * nhid  # MLP
    )
    return float(nlayers * per_layer)


def serving_attribution(clf, Xq, Eq, n_chain: int = 6) -> dict:
    """Phase attribution of one warm cached predict at a given request size
    (round-5 verdict #4): host preprocessing vs device compute vs the
    host↔device sync, plus an MFU figure for the cached forward. Mirrors
    `InferenceEngineCacheKV.iter_outputs` with timers; device time is
    measured latency-free by chaining the per-group cached forwards
    back-to-back with ONE final sync (the axon tunnel adds ~30 ms/sync)."""
    import jax
    import jax.numpy as jnp

    from multimodalpfn_tpu.estimator import inference as inf
    from multimodalpfn_tpu.estimator.data_utils import fix_dtypes, validate_X_predict

    eng = clf.executor_
    out: dict = {}
    t0 = time.time()
    Xv = validate_X_predict(Xq, clf)
    Xv = fix_dtypes(Xv, cat_indices=clf.categorical_features_indices)
    Xv = np.asarray(clf.preprocessor_.transform(Xv))
    X_tests = [
        None if m.X_train is None else m.preprocessor.transform(Xv).X
        for m in eng.members
    ]
    out["host_transform_ms"] = round((time.time() - t0) * 1e3, 1)

    t0 = time.time()
    n_test = len(X_tests[0]) if X_tests[0] is not None else len(Eq)
    pad_rows = inf._bucket_test_rows(n_test) - n_test
    if pad_rows:
        X_tests = [
            None if Xt is None
            else np.concatenate([Xt, np.repeat(Xt[-1:], pad_rows, axis=0)])
            for Xt in X_tests
        ]
    img_te = np.asarray(Eq, dtype=np.float32)
    if pad_rows:
        img_te = np.concatenate([img_te, np.repeat(img_te[-1:], pad_rows, axis=0)])
    groups = []
    for cache, idxs, width in eng.caches:
        xs = (
            None if width < 0
            else np.stack([
                inf._pad_width(X_tests[i].astype(np.float32), width) for i in idxs
            ])
        )
        groups.append((cache, xs))
    out["host_stack_ms"] = round((time.time() - t0) * 1e3, 1)

    fwd = inf._forward_cached_jit()
    img_b = jnp.asarray(img_te)[None]
    # settle + measure the tunnel sync floor
    ident = jax.jit(lambda a: a * 1.000001)
    z = np.asarray(ident(jnp.zeros((8, 8), jnp.float32)))
    t0 = time.time()
    z = ident(jnp.zeros((8, 8), jnp.float32))
    np.asarray(z)
    sync_ms = (time.time() - t0) * 1e3
    out["tunnel_sync_ms"] = round(sync_ms, 1)

    # warm the programs once, then chain n_chain full predict-dispatch sets
    lgs = [fwd(eng.params, eng._run_cfg, c, xs, img_b) for c, xs in groups]
    jax.device_get(lgs)
    t0 = time.time()
    for _ in range(n_chain):
        lgs = [fwd(eng.params, eng._run_cfg, c, xs, img_b) for c, xs in groups]
    jax.device_get(lgs)
    dev_ms = ((time.time() - t0) * 1e3 - sync_ms) / n_chain
    out["device_forward_ms"] = round(dev_ms, 1)

    cfg = eng.cfg
    n_img = inf._mixer_token_count(cfg.mixer, Eq.shape[-2]) if Eq is not None else 0
    fl = 0.0
    for cache, idxs, width in eng.caches:
        tok = (0 if width < 0 else -(-width // cfg.features_per_group)) + n_img + 1
        fl += len(idxs) * cached_predict_flops(
            t=tok, s_te=n_test + pad_rows, s_tr=cache.kv0.shape[-1],
            e=cfg.emsize, nhid=cfg.nhid, nlayers=cfg.nlayers,
        )
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, 197e12)
    out["cached_predict_tflops"] = round(fl / 1e12, 3)
    out["cached_predict_mfu"] = round(fl / (dev_ms / 1e3) / peak, 4)
    return out


def serving_metrics(
    X, emb, y, n_repeat: int = 11,
    batch_rows: tuple[int, ...] = (460, 920, 1840, 3680),
) -> dict:
    """Serving regime: fit once with the functional KV cache
    (`fit_mode="fit_with_cache"`, reference CacheKV mode `inference.py:354-513`),
    then repeated `predict_proba` calls. Reports steady samples/s and p50
    per-predict wall latency (includes host dispatch — the honest per-request
    number over the axon tunnel) at MULTIPLE request batch sizes: per-request
    overhead (host preprocess + tunnel sync, ~fixed) amortizes over rows, so
    throughput serving should batch requests — the sweep shows the curve.
    Larger points tile the 460 held-out rows (identical compute per row).

    Headline keys stay at the 460-row point (continuity with r2/r3 captures);
    `serving_batch_sweep` carries [rows, samples_per_s, p50_ms] per point.
    """
    from multimodalpfn_tpu import MMPFNClassifier

    ntr = int(len(X) * 0.8)
    n_test = len(X) - ntr
    clf = MMPFNClassifier(
        model_path="random:0", mixer_type="MGM+CAP", mgm_heads=BENCH_MGM,
        cap_heads=BENCH_CAP, features_per_group=1, n_estimators=BENCH_EST,
        random_state=0, fit_mode="fit_with_cache",
    )
    clf.fit(X[:ntr], emb[:ntr], y[:ntr])
    Xte, Ete = X[ntr:], emb[ntr:]
    out: dict = {}
    sweep = []
    for nb in batch_rows:
        reps = -(-nb // n_test)
        Xq = np.concatenate([Xte] * reps)[:nb]
        Eq = np.concatenate([Ete] * reps)[:nb]
        clf.predict_proba(Xq, Eq)  # warmup: compile this bucket
        lats = []
        for _ in range(n_repeat):
            t0 = time.time()
            clf.predict_proba(Xq, Eq)
            lats.append(time.time() - t0)
        p50 = float(np.median(lats))
        sweep.append([nb, round(nb / p50, 1), round(p50 * 1e3, 1)])
        if nb == n_test:
            out["serving_samples_per_s"] = round(n_test / p50, 1)
            out["serving_p50_predict_ms"] = round(p50 * 1e3, 1)
            out["serving_batch_rows"] = n_test
    out["serving_batch_sweep"] = sweep
    best = max(sweep, key=lambda r: r[1])
    out["serving_best_samples_per_s"] = best[1]
    out["serving_best_batch_rows"] = best[0]
    # pipelined request stream (round-5 `predict_proba_many`): host transforms
    # + upload of request N+1 overlap device execution of request N, so a
    # stream's throughput exceeds 1/p50 of sequential predicts — most at
    # small (latency-bound) requests where fixed host+sync overhead is the
    # larger share of the wall. Buckets are already warm from the sweep.
    try:
        for nb, key in ((n_test, "serving_pipelined_samples_per_s"),
                        (best[0], "serving_pipelined_best_samples_per_s")):
            reps = -(-nb // n_test)
            Xq = np.concatenate([Xte] * reps)[:nb]
            Eq = np.concatenate([Ete] * reps)[:nb]
            n_stream = n_repeat
            clf.predict_proba_many([Xq] * 2, [Eq] * 2)  # warm the pipeline path
            t0 = time.time()
            clf.predict_proba_many([Xq] * n_stream, [Eq] * n_stream, max_in_flight=2)
            wall = time.time() - t0
            out[key] = round(n_stream * nb / wall, 1)
            if best[0] == n_test:
                out["serving_pipelined_best_samples_per_s"] = out[key]
                break
    except Exception as e:  # pragma: no cover
        out["serving_pipelined_error"] = repr(e)[:200]
    # phase attribution + cached-forward MFU at the best point (verdict #4)
    try:
        reps = -(-best[0] // n_test)
        Xq = np.concatenate([Xte] * reps)[: best[0]]
        Eq = np.concatenate([Ete] * reps)[: best[0]]
        out["serving_attribution_rows"] = best[0]
        out.update(serving_attribution(clf, Xq, Eq))
    except Exception as e:  # pragma: no cover
        out["serving_attribution_error"] = repr(e)[:200]
    return out


def finetune_protocol_seconds(X, emb, y) -> tuple[float, float, float]:
    """The reference protocol: 100 steps + per-step validation, bs 1, frozen
    input encoders (reference 167.6 s on GPU, BASELINE.md). Returns
    (cold wall_s incl. compile, warm wall_s, steady-state s/iteration).

    The warm number re-runs the protocol with a different seed in the same
    process: fine-tune programs are memoized across calls (seed-independent —
    the subspace noise rides as a traced argument), which is the regime of the
    reference experiment driver (grid x 5 seeds of runs per process,
    `run.py:26-201`) for every trial after the first.
    """
    from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn

    ntr = int(len(X) * 0.8)

    def run(seed: int) -> tuple[float, list[float]]:
        from multimodalpfn_tpu.train.snapshots import wait_for_pending_snapshots

        with tempfile.TemporaryDirectory() as td:
            t0 = time.time()
            hist = fine_tune_mmpfn(
                mixer_type="MGM+CAP",
                mgm_heads=BENCH_MGM,
                cap_heads=BENCH_CAP,
                features_per_group=1,
                save_path_to_fine_tuned_model=Path(td) / "ft.ckpt",
                path_to_base_model="random:0",
                finetuning_config={"max_steps": 100, "validate_every_n_steps": 1},
                X_train=X[:ntr],
                image_train=emb[:ntr],
                y_train=y[:ntr],
                random_seed=seed,
                freeze_input=True,
                logger_level=30,
            )
            wall = time.time() - t0
            # the protocol's deliverable (best torch-format model) is flushed
            # before fine_tune returns; the extra orbax final-state artifact
            # drains in the background — join it AFTER the wall (an HPO
            # driver regains control at return) and before the tempdir dies
            wait_for_pending_snapshots()
            return wall, hist.get("step_seconds", [])

    wall_cold, _ = run(0)
    # best-of-2 for the warm wall: the axon relay occasionally stalls a host
    # sync for hundreds of ms, which a SINGLE 100-sync protocol wall cannot
    # reject (measured spread on identical in-process warm runs: 46-246 s).
    # Both raw walls are reported in the bench JSON so the statistic is
    # visible next to any comparison. The per-step medians below reject the
    # stalls for the steady-state rate.
    wall_warm, steps = run(1)
    wall_warm2, steps2 = run(2)
    tail = steps[5:] + steps2[5:]
    steady = float(np.median(tail)) if tail else float("nan")
    return wall_cold, min(wall_warm, wall_warm2), steady, [wall_warm, wall_warm2]


def finetune_steady_full_effort_s(X, emb, y, n_steps: int = 30) -> float:
    """Steady-state s/step with the compile-effort knob OFF (XLA default
    effort), so the -0.5 default's measured +11% steady cost stays visible
    next to `finetune_steady_s_per_step` in the driver JSON (round-3 verdict
    ask). Pays one full-effort compile of the fused step+val program."""
    from multimodalpfn_tpu.train import finetune as _ft
    from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn

    _ft._PROGRAM_CACHE.clear()  # memoized programs were compiled at -0.5
    prev = os.environ.get("MMPFN_COMPILE_EFFORT")
    os.environ["MMPFN_COMPILE_EFFORT"] = "0"
    ntr = int(len(X) * 0.8)
    try:
        with tempfile.TemporaryDirectory() as td:
            hist = fine_tune_mmpfn(
                mixer_type="MGM+CAP",
                mgm_heads=BENCH_MGM,
                cap_heads=BENCH_CAP,
                features_per_group=1,
                save_path_to_fine_tuned_model=Path(td) / "ft.ckpt",
                path_to_base_model="random:0",
                finetuning_config={
                    "max_steps": n_steps, "validate_every_n_steps": 1,
                },
                X_train=X[:ntr],
                image_train=emb[:ntr],
                y_train=y[:ntr],
                random_seed=3,
                freeze_input=True,
                logger_level=30,
            )
            from multimodalpfn_tpu.train.snapshots import (
                wait_for_pending_snapshots,
            )

            wait_for_pending_snapshots()
        return float(np.median(hist.get("step_seconds", [])[5:]))
    finally:
        if prev is None:
            os.environ.pop("MMPFN_COMPILE_EFFORT", None)
        else:
            os.environ["MMPFN_COMPILE_EFFORT"] = prev
        _ft._PROGRAM_CACHE.clear()  # full-effort programs must not leak


def _probe_backend(timeout_s: int = 240) -> str | None:
    """Fail fast when the accelerator is unreachable: backend init over a dead
    tunnel blocks indefinitely, which would hang the whole bench. Probe in a
    subprocess with a deadline; returns the platform name or None."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if out.returncode == 0:
            return out.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        pass
    return None


def main() -> None:
    platform = _probe_backend()
    if platform is None:
        print(json.dumps({
            "metric": "PAD-UFES-20-shaped fit+predict throughput",
            "value": None, "unit": "test samples/sec/chip", "vs_baseline": None,
            "extra": {"error": "accelerator backend unreachable (axon tunnel "
                               "down?) — no measurement taken"},
        }))
        raise SystemExit(3)

    # persistent compilation cache (OPT-IN via MMPFN_JAX_CACHE_DIR — disabled
    # by default because cache writes stall badly over the remote-TPU tunnel)
    from multimodalpfn_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like

    X, emb, y = pad_ufes_like(seed=0)
    value, _n_test = fit_predict_throughput(X, emb, y)

    baseline_file = Path(__file__).parent / "bench_baseline.json"
    vs_baseline = 0.0
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())
        if base.get("samples_per_sec"):
            vs_baseline = value / float(base["samples_per_sec"])

    extra = {}
    try:
        extra.update(kernel_parity_metrics())
    except Exception as e:  # pragma: no cover - a crash IS a parity failure
        extra["kernel_parity_ok"] = False
        extra["kernel_parity_error"] = repr(e)[:300]
    try:
        extra.update(train_step_mfu())
    except Exception as e:  # pragma: no cover - keep the headline metric alive
        extra["mfu_error"] = repr(e)[:200]
    try:
        extra.update(sweep_metrics())
    except Exception as e:  # pragma: no cover
        extra["sweep_error"] = repr(e)[:200]
    try:
        # second operating point: 8 runs resident (same remat decision as
        # production); keep the n=4 numbers as the headline keys
        m8 = sweep_metrics(n_runs=8)
        extra.update({f"{k}_n8": v for k, v in m8.items() if k != "sweep_runs"})
    except Exception as e:  # pragma: no cover - OOM-guarded
        extra["sweep8_error"] = repr(e)[:200]
    try:
        # heterogeneous cross-cell regime: mixed mgm_heads in ONE vmapped
        # stream — the shape the reference grid (mgm 2..256, shared small cap)
        # actually requires. Runs the same fused/flash program as the
        # homogeneous sweep; MFU counts active (unpadded) FLOPs.
        mh = sweep_metrics(n_runs=4, mgm_list=(16, 16, 64, 64))
        extra.update({
            (k if k in ("sweep_mgm_list", "sweep_pad_overhead")
             else f"{k}_hetero"): v
            for k, v in mh.items() if k != "sweep_runs"
        })
    except Exception as e:  # pragma: no cover
        extra["sweep_hetero_error"] = repr(e)[:200]
    try:
        extra.update(serving_metrics(X, emb, y))
    except Exception as e:  # pragma: no cover
        extra["serving_error"] = repr(e)[:200]
    try:
        try:
            ft_s, ft_warm_s, steady, warm_raw = finetune_protocol_seconds(X, emb, y)
        except Exception:
            # the remote compile service occasionally 500s; retry once COLD:
            # dropping the memoized programs forces the XLA compile again so
            # finetune_100steps_s keeps its incl.-compile meaning
            from multimodalpfn_tpu.train import finetune as _ft

            _ft._PROGRAM_CACHE.clear()
            extra["finetune_retried"] = True
            ft_s, ft_warm_s, steady, warm_raw = finetune_protocol_seconds(X, emb, y)
        extra["finetune_100steps_s"] = round(ft_s, 1)
        extra["finetune_vs_reference_gpu"] = round(167.6 / ft_s, 2)
        # warm = every HPO trial after the first in a process (program cache);
        # best-of-2 (relay-stall rejection) — both raw walls recorded
        extra["finetune_100steps_warm_s"] = round(ft_warm_s, 1)
        extra["finetune_warm_raw_s"] = [round(w, 1) for w in warm_raw]
        extra["finetune_warm_vs_reference_gpu"] = round(167.6 / ft_warm_s, 2)
        # steady-state = step + validation + episode sampling, compile excluded
        extra["finetune_steady_s_per_step"] = round(steady, 3)
        extra["finetune_steady_vs_reference_gpu"] = round(1.676 / steady, 2)
        try:
            steady_full = finetune_steady_full_effort_s(X, emb, y)
            extra["finetune_steady_full_effort_s_per_step"] = round(
                steady_full, 3
            )
        except Exception as e:  # pragma: no cover
            extra["finetune_steady_full_effort_error"] = repr(e)[:200]
    except Exception as e:  # pragma: no cover
        extra["finetune_error"] = repr(e)[:200]

    print(
        json.dumps(
            {
                "metric": "PAD-UFES-20-shaped fit+predict throughput (4-member MGM+CAP ensemble, 1 chip)",
                "value": round(value, 2),
                "unit": "test samples/sec/chip",
                "vs_baseline": round(vs_baseline, 2),
                "extra": extra,
            }
        )
    )
    if extra.get("kernel_parity_ok") is False:
        # the JSON line above still carries every measurement; the nonzero
        # exit makes an on-hardware kernel regression impossible to miss
        raise SystemExit(4)


if __name__ == "__main__":
    main()
