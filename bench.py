"""Benchmark: sampling clips/sec/chip for 1000-step DDPM on Xia 196-frame.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

- value: clips/sec/chip of our jitted lax.scan DDPM sampler running the full
  StyleDiffusion denoiser (d=512, 8 layers) on the available chip, at the
  best batch size from a small sweep, bf16 activations.
- vs_baseline: speedup over a CPU-PyTorch reference baseline: an equivalent
  torch transformer denoiser driven by a per-step python loop (the
  reference's gaussian_diffusion.p_sample_loop structure), measured over a
  step subsample and scaled to 1000 steps (per-step cost is constant).
Extras report p50 single-clip transfer latency (DDIM-20/skip-14 demo config)
and the fp32 number.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def enable_compile_cache():
    from motionstyle.utils import enable_compile_cache as _ecc

    _ecc()

C, T_FRAMES = 181, 196
DDPM_STEPS = 1000
LATENT, LAYERS, HEADS, FF = 512, 8, 4, 1024
V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e MXU peak, bf16

NORTH_STAR = "clips/sec/chip (1000-step DDPM, Xia 196-frame)"


def probe_backend(retries: int = 3, wait_s: float = 20.0):
    """Probe jax backend initialization in a SUBPROCESS with bounded retries
    (the TPU tunnel flaps; in-process init failures are cached by jax, so the
    probe must be out-of-process). Returns None on success or an error string
    after the final attempt."""
    err = None
    for attempt in range(retries):
        if attempt:
            time.sleep(wait_s)
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=150,
            )
            if out.returncode == 0:
                return None
            err = (out.stderr.strip().splitlines() or ["unknown"])[-1][:300]
        except subprocess.TimeoutExpired:
            err = "backend probe timed out after 150s"
    return f"jax backend unavailable after {retries} attempts: {err}"


def emit_error(metric: str, err: str, unit: str = "clips/s") -> None:
    """One parseable JSON line on failure (never a raw traceback)."""
    print(json.dumps({"metric": metric, "value": None, "unit": unit,
                      "vs_baseline": None, "error": err}))


def denoiser_flops_per_clip_step(n_feats: int = C, n_frames: int = T_FRAMES) -> float:
    """Matmul FLOPs of ONE denoiser forward for ONE clip (fwd only, 2*M*N*K
    per matmul): 8-layer post-LN encoder at d=512/ff=1024 over L = frames + 1
    cond token, plus the input/output feature projections."""
    L = n_frames + 1
    d, ff = LATENT, FF
    per_layer = (
        8 * L * d * d        # qkv (3) + attention output (1) projections
        + 4 * L * L * d      # scores (QK^T) + attention-weighted V
        + 4 * L * d * ff     # FFN linear1 + linear2
    )
    io = 4 * n_frames * n_feats * d  # InputProcess + OutputProcess linears
    return float(LAYERS * per_layer + io)


def bench_ours(batch: int, dtype: str, reps: int = 3) -> float:
    """Returns clips/sec for one full 1000-step DDPM sampling of `batch` clips."""
    import jax
    import jax.numpy as jnp

    from motionstyle.diffusion import sampling
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    is_int8 = dtype.startswith("int8")
    cfg = MDMConfig(njoints=C, nfeats=1, latent_dim=LATENT, ff_size=FF, num_layers=LAYERS,
                    num_heads=HEADS,
                    dtype="float32" if dtype == "f32" else "bfloat16",
                    fused=dtype.endswith("fused") or is_int8, quant_int8=is_int8)
    model = StyleDiffusion(cfg)
    x0 = jnp.zeros((batch, C, 1, T_FRAMES), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((batch,), jnp.int32), jnp.zeros((batch, 512)))
    sched = make_schedule("cosine", DDPM_STEPS)
    enc_text = jnp.zeros((batch, 512), dtype=jnp.float32)

    def model_fn(x, t_orig, cond):
        return model.apply(params, x, t_orig, cond["enc_text"])

    @jax.jit
    def run(rng):
        return sampling.sample_loop(
            sched, model_fn, {"enc_text": enc_text}, rng,
            shape=(batch, C, 1, T_FRAMES), method="ddpm", remat=False,
        )

    jax.block_until_ready(run(jax.random.PRNGKey(1)))  # compile
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    return batch / float(np.median(times))


def bench_transfer_latency(reps: int = 10, dtype: str = "bf16",
                           early_stop: bool = False,
                           percentile: float = 50.0) -> float:
    """Latency percentile (s) of the demo config: DDIM-20, skip 14,
    inpainting, B=1, output = the demo's dump[-5] under-denoise pick.

    early_stop: stop the chain at t=4 (where the dump[-5] x0 lives) — the
    bit-identical 2-eval serving path (min-latency preset,
    ShardedSampler.min_latency). dtype 'int8' adds quantized serving."""
    import jax
    import jax.numpy as jnp

    from motionstyle.data.masks import get_inpainting_mask
    from motionstyle.diffusion import sampling
    from motionstyle.diffusion.ddpm import Inpainting
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    cfg = MDMConfig(njoints=C, nfeats=1, latent_dim=LATENT, ff_size=FF, num_layers=LAYERS,
                    num_heads=HEADS, dtype="bfloat16", fused=True,
                    quant_int8=dtype == "int8")
    model = StyleDiffusion(cfg)
    Tx = 76
    x0 = jnp.zeros((1, C, 1, Tx), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 512)))
    sched = make_schedule("cosine", DDPM_STEPS, "ddim20")
    content = jax.random.normal(jax.random.PRNGKey(1), (1, C, 1, Tx))
    mask = jnp.asarray(get_inpainting_mask("root_horizontal", (1, C, 1, Tx), dataset="stylexia_posrot"), jnp.float32)
    enc_text = jnp.zeros((1, 512))

    def model_fn(x, t_orig, cond):
        return model.apply(params, x, t_orig, cond["enc_text"])

    @jax.jit
    def run(rng):
        xs = sampling.sample_loop(
            sched, model_fn, {"enc_text": enc_text}, rng, shape=(1, C, 1, Tx),
            init_image=content, method="ddim", skip_timesteps=14,
            stop_timesteps=4 if early_stop else None,
            inpainting=Inpainting(mask, content), dump_all_xstart=True, remat=False,
        )
        return xs[-1] if early_stop else xs[-5]

    jax.block_until_ready(run(jax.random.PRNGKey(2)))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(3 + i)))
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, percentile))


def bench_torch_cpu_baseline(measure_steps: int = 30) -> float:
    """CPU-PyTorch reference: per-step transformer forward + DDPM update in a
    python loop (the reference's sampler structure). Returns clips/sec for a
    full 1000-step sampling of ONE clip (extrapolated from measure_steps)."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(max(1, (__import__("os").cpu_count() or 4) - 1))

    class TorchDenoiser(nn.Module):
        def __init__(self):
            super().__init__()
            self.inp = nn.Linear(C, LATENT)
            layer = nn.TransformerEncoderLayer(LATENT, HEADS, FF, 0.1, "gelu")
            self.enc = nn.TransformerEncoder(layer, LAYERS)
            self.t_emb = nn.Sequential(nn.Linear(LATENT, LATENT), nn.SiLU(), nn.Linear(LATENT, LATENT))
            self.out = nn.Linear(LATENT, C)
            pe = torch.zeros(5000, LATENT)
            pos = torch.arange(5000, dtype=torch.float32)[:, None]
            div = torch.exp(torch.arange(0, LATENT, 2).float() * (-np.log(10000.0) / LATENT))
            pe[:, 0::2] = torch.sin(pos * div)
            pe[:, 1::2] = torch.cos(pos * div)
            self.register_buffer("pe", pe)

        def forward(self, x, t):
            # x (B, C, 1, T) -> tokens (T, B, d), cond token prepended
            B = x.shape[0]
            h = self.inp(x[:, :, 0, :].permute(2, 0, 1))
            emb = self.t_emb(self.pe[t])[None]
            seq = torch.cat([emb.expand(1, B, LATENT), h], 0) + self.pe[: h.shape[0] + 1, None]
            return self.out(self.enc(seq)[1:]).permute(1, 2, 0)[:, :, None, :]

    model = TorchDenoiser().eval()
    # cosine schedule, same as our sampler (gaussian_diffusion.py:36-66 math)
    ts = np.arange(DDPM_STEPS + 1) / DDPM_STEPS
    abar = np.cos((ts + 0.008) / 1.008 * np.pi / 2) ** 2
    betas = np.clip(1.0 - abar[1:] / abar[:-1], 0.0, 0.999)
    alphas_cumprod = np.cumprod(1 - betas)
    x = torch.randn(1, C, 1, T_FRAMES)
    with torch.no_grad():
        model(x, torch.tensor([999]))  # warm up
        t0 = time.perf_counter()
        for i in range(measure_steps):
            t = DDPM_STEPS - 1 - i
            x0_pred = model(x, torch.tensor([t]))
            ac, acp = alphas_cumprod[t], alphas_cumprod[t - 1] if t > 0 else 1.0
            coef1 = betas[t] * np.sqrt(acp) / (1 - ac)
            coef2 = (1 - acp) * np.sqrt(1 - betas[t]) / (1 - ac)
            mean = coef1 * x0_pred + coef2 * x
            x = mean + float(np.sqrt(betas[t])) * torch.randn_like(x)
        per_step = (time.perf_counter() - t0) / measure_steps
    return 1.0 / (per_step * DDPM_STEPS)


def bench_cfg_ddim100_batched(batch: int = 32, reps: int = 3) -> float:
    """BASELINE config: 32-clip CFG-guided inpainting DDIM-100 batched
    inference (Xia). Returns clips/sec."""
    import jax
    import jax.numpy as jnp

    from motionstyle.data.masks import get_inpainting_mask
    from motionstyle.diffusion import sampling
    from motionstyle.diffusion.ddpm import Inpainting, cfg_model_fn
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    Tx = 76
    cfg = MDMConfig(njoints=C, nfeats=1, dtype="bfloat16", fused=True)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((batch, C, 1, Tx)),
                        jnp.zeros((batch,), jnp.int32), jnp.zeros((batch, 512)))
    sched = make_schedule("cosine", DDPM_STEPS, "ddim100")
    content = jax.random.normal(jax.random.PRNGKey(1), (batch, C, 1, Tx))
    mask = jnp.asarray(get_inpainting_mask("root_horizontal", (batch, C, 1, Tx),
                                           dataset="stylexia_posrot"), jnp.float32)
    guided = cfg_model_fn(lambda x, t, c: model.apply(params, x, t, c["enc_text"]),
                          jnp.full((batch,), 2.5))

    @jax.jit
    def run(rng):
        return sampling.sample_loop(
            sched, guided, {"enc_text": jnp.zeros((batch, 512))}, rng,
            shape=(batch, C, 1, Tx), init_image=content, method="ddim",
            skip_timesteps=70, inpainting=Inpainting(mask, content), remat=False)

    jax.block_until_ready(run(jax.random.PRNGKey(2)))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(3 + i)))
        times.append(time.perf_counter() - t0)
    return batch / float(np.median(times))


def bench_bandai_long_batch(batch: int = 16, reps: int = 3) -> float:
    """BASELINE config: Bandai 196x190 batched style transfer (DDIM-20/skip-14)."""
    import jax
    import jax.numpy as jnp

    from motionstyle.data.masks import get_inpainting_mask
    from motionstyle.diffusion import sampling
    from motionstyle.diffusion.ddpm import Inpainting
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    Cb, Tb = 190, 196
    cfg = MDMConfig(njoints=Cb, nfeats=1, dtype="bfloat16", fused=True)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((batch, Cb, 1, Tb)),
                        jnp.zeros((batch,), jnp.int32), jnp.zeros((batch, 512)))
    sched = make_schedule("cosine", DDPM_STEPS, "ddim20")
    content = jax.random.normal(jax.random.PRNGKey(1), (batch, Cb, 1, Tb))
    mask = jnp.asarray(get_inpainting_mask("root_horizontal", (batch, Cb, 1, Tb),
                                           dataset="bandai-2_posrot"), jnp.float32)

    @jax.jit
    def run(rng):
        return sampling.sample_loop(
            sched, lambda x, t, c: model.apply(params, x, t, c["enc_text"]),
            {"enc_text": jnp.zeros((batch, 512))}, rng,
            shape=(batch, Cb, 1, Tb), init_image=content, method="ddim",
            skip_timesteps=14, inpainting=Inpainting(mask, content),
            dump_all_xstart=True, remat=False)[-5]

    jax.block_until_ready(run(jax.random.PRNGKey(2)))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(3 + i)))
        times.append(time.perf_counter() - t0)
    return batch / float(np.median(times))


def bench_finetune_steps(steps: int = 32, parallel: bool = False,
                         fused_train: bool = False) -> float:
    """BASELINE config: few-shot finetune (~32 steps). Returns steps/sec
    (steady state, compile excluded)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from motionstyle.data.masks import get_inpainting_mask
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
    from motionstyle.train.finetune import FinetuneConfig, StyleFinetuneTrainer

    Tx = 76
    cfg_m = MDMConfig(njoints=C, nfeats=1, fused_train=fused_train)
    model = StyleDiffusion(cfg_m)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, C, 1, Tx)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 512)),
                        method=StyleDiffusion.full_init)
    sched = make_schedule("cosine", DDPM_STEPS, "ddim20")
    tr = StyleFinetuneTrainer(
        FinetuneConfig(save_dir=tempfile.mkdtemp(), num_steps=steps, save_interval=10 ** 9,
                       parallel_unroll=parallel),
        model, params, sched)
    r = np.random.RandomState(0)
    inp = get_inpainting_mask("root_horizontal", (1, C, 1, Tx), dataset="stylexia_posrot").astype(np.float32)
    batch = dict(
        x_start=r.randn(1, C, 1, Tx).astype(np.float32),
        content=r.randn(1, C, 1, Tx).astype(np.float32),
        style_target=r.randn(1, C, 1, Tx).astype(np.float32),
        mask=np.ones((1, 1, 1, Tx), np.float32), inp_mask=inp,
        enc_text_style=r.randn(1, 512).astype(np.float32),
        enc_text_t2m=r.randn(1, 512).astype(np.float32), inp_mask_t2m=inp,
        text_features=r.randn(1, 512).astype(np.float32),
    )
    tr.run_step(batch)  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        tr.run_step(batch)
    return steps / (time.perf_counter() - t0)


def denoiser_forward_gflops(C_feats: int, n_tokens: int, d: int = LATENT,
                            ff: int = FF, layers: int = LAYERS) -> float:
    """Analytic matmul FLOPs of ONE denoiser forward for ONE clip (GFLOP).
    Same accounting as the BASELINE MFU note: per token per layer
    qkv+out = 8d^2, attention scores+probsV = 4*S*d, FFN = 4*d*ff, plus the
    C<->d io projections (2*C*d each way)."""
    per_tok_layer = 8 * d * d + 4 * n_tokens * d + 4 * d * ff
    per_tok = layers * per_tok_layer + 4 * C_feats * d
    return n_tokens * per_tok / 1e9


def bench_pretrain(batch: int = 64, steps: int = 30, dtype: str = "bfloat16",
                   fused_train: bool = False, fused_train_store: bool = False,
                   fused_train_prng: bool = False, grad_accum: int = 1) -> dict:
    """Prior-pretraining throughput: the full-size text-conditioned MDM
    prior (d=512/8L) trained with the standard denoising objective
    (train/pretrain.py — the large-batch production TRAINING path, vs the
    B=1 latency-bound few-shot finetune row) on the HumanML3D workload
    (263 x 196). Returns {steps_per_sec, clips_per_sec, mfu_pct}; MFU uses
    XLA's compiled flop count when the backend reports one, else the
    analytic fwd+bwd estimate (3x forward).

    The batch is device-put ONCE and the loop only syncs at the end: this
    measures the chip's training rate (what a prefetching input pipeline —
    data/native_loader.py overlaps H2D with compute — sustains), not this
    environment's relay upload bandwidth, which re-uploading a 13 MB numpy
    batch every step would turn into the bottleneck (measured 2.7 steps/s
    vs the actual device rate)."""
    import jax
    import jax.numpy as jnp

    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
    from motionstyle.train.pretrain import PretrainConfig, PriorTrainer

    Ch, Th = 263, 196
    cfg_m = MDMConfig(njoints=Ch, nfeats=1, dtype=dtype,
                      fused_train=(fused_train or fused_train_store
                                   or fused_train_prng),
                      fused_train_store=fused_train_store,
                      fused_train_prng=fused_train_prng)
    model = StyleDiffusion(cfg_m)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((batch, Ch, 1, Th)),
                        jnp.zeros((batch,), jnp.int32), jnp.zeros((batch, 512)),
                        method=StyleDiffusion.full_init)
    sched = make_schedule("cosine", DDPM_STEPS)
    import tempfile

    tr = PriorTrainer(PretrainConfig(save_dir=tempfile.mkdtemp(),
                                     log_interval=0, save_interval=0,
                                     grad_accum=grad_accum),
                      model, params, sched)
    r = np.random.RandomState(0)
    bt = dict(x_start=r.randn(batch, Ch, 1, Th).astype(np.float32),
              enc_text=r.randn(batch, 512).astype(np.float32),
              mask=np.ones((batch, 1, 1, Th), np.float32))
    bt = {k: jax.device_put(v) for k, v in bt.items()}  # resident, once
    flops = None
    # XLA cost analysis reports ~0 flops for Pallas custom calls, so the
    # fused_train path always uses the analytic fwd+bwd estimate — keeps
    # MFU comparable across the XLA and fused paths
    if not fused_train:
        try:  # exact compiled flops (includes backward; axon may not report)
            t_probe = np.zeros((batch,), np.int64)
            ca = tr._train_step.lower(
                tr.params, tr.opt_state, tr.ema, tr.rng,
                dict(bt, t=t_probe)).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
    float(np.asarray(tr.run_step(bt)))  # compile + flush
    t0 = time.perf_counter()
    loss = None
    for _ in range(steps):
        loss = tr.run_step(bt)
    float(np.asarray(loss))  # block: drain the async dispatch pipeline
    dt = time.perf_counter() - t0
    sps = steps / dt
    if flops is None:  # analytic fwd+bwd: backward ~ 2x forward matmul FLOPs
        flops = 3.0 * denoiser_forward_gflops(Ch, Th + 1) * 1e9 * batch
    mfu = flops * sps / (V5E_BF16_PEAK_TFLOPS * 1e12) * 100.0
    out = {"steps_per_sec": round(sps, 3),
           "clips_per_sec": round(sps * batch, 1),
           "mfu_pct": round(mfu, 1), "batch": batch, "dtype": dtype}
    if fused_train or fused_train_store:
        out["fused_train"] = True
    if fused_train_store:
        out["fused_train_store"] = True
    if fused_train_prng:
        out["fused_train_prng"] = True
    if grad_accum > 1:
        out["grad_accum"] = grad_accum
    return out


def bench_humanml_prior_fk(batch: int = 8, reps: int = 2) -> float:
    """BASELINE config: HumanML3D T2M prior DDPM-1000 sampling + on-device
    recover_from_ric decode. Returns clips/sec."""
    import jax
    import jax.numpy as jnp

    from motionstyle.core.features import recover_from_ric
    from motionstyle.diffusion import sampling
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    Ch, Th = 263, 196
    cfg = MDMConfig(njoints=Ch, nfeats=1, dtype="bfloat16", fused=True)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((batch, Ch, 1, Th)),
                        jnp.zeros((batch,), jnp.int32), jnp.zeros((batch, 512)),
                        method=StyleDiffusion.full_init)
    sched = make_schedule("cosine", DDPM_STEPS)

    @jax.jit
    def run(rng):
        sample = sampling.sample_loop(
            sched, lambda x, t, c: model.apply(params, x, t, c["enc_text"],
                                               method=StyleDiffusion.denoise_prior),
            {"enc_text": jnp.zeros((batch, 512))}, rng,
            shape=(batch, Ch, 1, Th), method="ddpm", remat=False)
        return recover_from_ric(sample[:, :, 0, :].transpose(0, 2, 1), 22)

    jax.block_until_ready(run(jax.random.PRNGKey(1)))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    return batch / float(np.median(times))


def bench_parallel_in_time(batch: int = 1, window: int = 32, reps: int = 3) -> dict:
    """Latency of 1000-step DDPM single-clip sampling via the parallel-in-time
    Picard sampler vs the sequential scan (diffusion/parallel_sampling.py).
    Returns {seq_s, par_s, sweeps, speedup}."""
    import jax
    import jax.numpy as jnp

    from motionstyle.diffusion import sampling
    from motionstyle.diffusion.parallel_sampling import parallel_sample_loop
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    cfg = MDMConfig(njoints=C, nfeats=1, dtype="bfloat16", fused=True)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((batch, C, 1, T_FRAMES)),
                        jnp.zeros((batch,), jnp.int32), jnp.zeros((batch, 512)))
    sched = make_schedule("cosine", DDPM_STEPS)
    enc_text = jnp.zeros((batch, 512))

    def model_fn(x, t, c):
        return model.apply(params, x, t, c["enc_text"])

    @jax.jit
    def run_seq(rng):
        return sampling.sample_loop(sched, model_fn, {"enc_text": enc_text}, rng,
                                    shape=(batch, C, 1, T_FRAMES), method="ddpm",
                                    remat=False)

    @jax.jit
    def run_par(rng):
        return parallel_sample_loop(sched, model_fn, {"enc_text": enc_text}, rng,
                                    shape=(batch, C, 1, T_FRAMES), method="ddpm",
                                    window=window)

    def timed(fn):
        jax.block_until_ready(fn(jax.random.PRNGKey(1)))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            out = fn(jax.random.PRNGKey(2 + i))
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), out

    seq_s, _ = timed(run_seq)
    par_s, (_, sweeps) = timed(run_par)
    return {"seq_s": round(seq_s, 4), "par_s": round(par_s, 4),
            "sweeps": int(sweeps), "speedup": round(seq_s / par_s, 2)}


def bench_forecast(batch: int = 64, strides=(2, 4), reps: int = 3) -> dict:
    """Throughput of the north-star config with multistep x0 forecasting
    (diffusion/forecast_sampling.py): denoiser called every stride-th step.
    Returns clips/s per stride plus the exact (stride 1) reference."""
    import jax
    import jax.numpy as jnp

    from motionstyle.diffusion.forecast_sampling import forecast_sample_loop
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    cfg = MDMConfig(njoints=C, nfeats=1, dtype="bfloat16", fused=True)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((batch, C, 1, T_FRAMES)),
                        jnp.zeros((batch,), jnp.int32), jnp.zeros((batch, 512)))
    sched = make_schedule("cosine", DDPM_STEPS)
    enc_text = jnp.zeros((batch, 512))

    def model_fn(x, t, c):
        return model.apply(params, x, t, c["enc_text"])

    out = {}
    for stride in (1,) + tuple(strides):
        run = jax.jit(lambda rng, s=stride: forecast_sample_loop(
            sched, model_fn, {"enc_text": enc_text}, rng,
            shape=(batch, C, 1, T_FRAMES), method="ddpm", stride=s))
        jax.block_until_ready(run(jax.random.PRNGKey(1)))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jax.random.PRNGKey(2 + i)))
            ts.append(time.perf_counter() - t0)
        out[f"stride{stride}_clips_per_sec"] = round(batch / float(np.median(ts)), 3)
    base = out["stride1_clips_per_sec"]
    for stride in strides:
        out[f"stride{stride}_speedup"] = round(
            out[f"stride{stride}_clips_per_sec"] / base, 2)
    return out


def bench_serving(n_requests: int = 64, concurrency: int = 16) -> dict:
    """Sustained throughput of the HTTP-serving device path: the
    ServingEngine (dynamic batcher -> min-latency ShardedSampler plan,
    serve/engine.py) under concurrent single-clip traffic, vs the same
    requests issued strictly one at a time. Measures what batching buys a
    live endpoint on one chip (full-size model, DDIM-20/skip-14 early-stop,
    bf16 fused)."""
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp

    from motionstyle.data.masks import get_inpainting_mask
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
    from motionstyle.parallel.inference import ShardedSampler
    from motionstyle.parallel.mesh import make_mesh
    from motionstyle.serve.engine import Request, ServingEngine

    Tx = 76
    cfg = MDMConfig(njoints=C, nfeats=1, latent_dim=LATENT, ff_size=FF,
                    num_layers=LAYERS, num_heads=HEADS, dtype="bfloat16",
                    fused=True)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, C, 1, Tx)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 512)))
    sched = make_schedule("cosine", DDPM_STEPS, "ddim20")
    mesh = make_mesh(len(jax.devices()))

    def builder(p):
        return lambda x, t, c: model.apply(p, x, t, c.get("enc_text"))

    sampler = ShardedSampler(mesh, sched, builder, params, method="ddim",
                             skip_timesteps=14, stop_timesteps=4,
                             dump_all_xstart=True)
    # buckets (1, 8): solo requests pay true single-clip cost (no padding
    # waste inflating the speedup) and only two executables compile
    engine = ServingEngine(sampler, (C, 1, Tx), max_batch=8, max_wait_ms=3.0,
                           buckets=(1, 8))
    mask = np.asarray(get_inpainting_mask(
        "root_horizontal", (1, C, 1, Tx), dataset="stylexia_posrot"),
        np.float32)[0]
    r = np.random.RandomState(0)
    content = r.randn(C, 1, Tx).astype(np.float32)
    enc = r.randn(512).astype(np.float32)

    def req(seed):
        return Request({"enc_text": enc}, init_image=content,
                       inpainting_mask=mask, seed=seed)

    try:
        engine.sample(req(0))  # compile bucket 1
        for f in [engine.submit(req(i)) for i in range(8)]:  # compile bucket 8
            f.result(timeout=600)

        t0 = time.perf_counter()
        for i in range(8):
            engine.sample(req(100 + i))
        solo_rps = 8 / (time.perf_counter() - t0)

        before = engine.stats()
        with cf.ThreadPoolExecutor(concurrency) as pool:
            t0 = time.perf_counter()
            futs = list(pool.map(
                lambda s: engine.submit(req(s)), range(n_requests)))
            for f in futs:
                f.result(timeout=600)
            dt = time.perf_counter() - t0
        after = engine.stats()
    finally:
        engine.close()
    # coalescing measured over the concurrent phase only (warmup and the
    # solo baseline would drag the mean toward 1)
    n_batches = after["batches"] - before["batches"]
    mean_batch = (after["requests"] - before["requests"]) / max(1, n_batches)
    return {"throughput_rps": round(n_requests / dt, 2),
            "solo_rps": round(solo_rps, 2),
            "batching_speedup": round(n_requests / dt / solo_rps, 2),
            "mean_batch_size": round(mean_batch, 2)}


def main_full():
    """All BASELINE.json benchmark configs, one JSON line each."""
    for name, fn, unit in (
        ("xia_demo_p50_latency_ms", lambda: bench_transfer_latency() * 1e3, "ms"),
        ("xia_min_latency_preset_p50_ms",
         lambda: bench_transfer_latency(early_stop=True, dtype="int8") * 1e3, "ms"),
        ("xia_min_latency_preset_p99_ms",
         lambda: bench_transfer_latency(reps=30, early_stop=True, dtype="int8",
                                        percentile=99.0) * 1e3, "ms"),
        ("few_shot_finetune_steps_per_sec", bench_finetune_steps, "steps/s"),
        ("cfg_ddim100_32clip_clips_per_sec", bench_cfg_ddim100_batched, "clips/s"),
        ("bandai_long_batch_clips_per_sec", bench_bandai_long_batch, "clips/s"),
        ("humanml_prior_fk_clips_per_sec", bench_humanml_prior_fk, "clips/s"),
    ):
        try:
            v = fn()
            print(json.dumps({"metric": name, "value": round(float(v), 3), "unit": unit}))
        except Exception as e:  # keep the remaining configs running
            emit_error(name, f"{type(e).__name__}: {e}"[:300], unit)
    try:
        r = bench_parallel_in_time()
        print(json.dumps({"metric": "parallel_in_time_ddpm1000_b1_w32",
                          "unit": "x-vs-sequential", "value": r["speedup"], **r}))
    except Exception as e:
        emit_error("parallel_in_time_ddpm1000_b1_w32",
                   f"{type(e).__name__}: {e}"[:300], "x-vs-sequential")
    try:
        r = bench_forecast()
        print(json.dumps({"metric": "forecast_sampling_ddpm1000_b64",
                          "unit": "x-vs-exact", "value": r["stride2_speedup"], **r}))
    except Exception as e:
        emit_error("forecast_sampling_ddpm1000_b64",
                   f"{type(e).__name__}: {e}"[:300], "x-vs-exact")
    try:
        r = bench_serving()
        print(json.dumps({"metric": "serving_engine_concurrent_16x64",
                          "unit": "req/s", "value": r["throughput_rps"], **r}))
    except Exception as e:
        emit_error("serving_engine_concurrent_16x64",
                   f"{type(e).__name__}: {e}"[:300], "req/s")
    try:
        r = bench_pretrain()
        print(json.dumps({"metric": "prior_pretrain_humanml_b64",
                          "unit": "clips/s", "value": r["clips_per_sec"], **r}))
    except Exception as e:
        emit_error("prior_pretrain_humanml_b64",
                   f"{type(e).__name__}: {e}"[:300], "clips/s")


def main():
    # Our jitted benches run FIRST (after a subprocess backend probe with
    # retries) so a flaky tunnel can't waste minutes in the torch baseline
    # before dying — and failures print a parseable error JSON line.
    best = (0.0, None, None)
    results = {}
    # b32/b256 measured once and recorded in BASELINE.md (interior maximum at
    # b64-b128); kept out of the default sweep to bound driver wall-clock
    for dtype, batches in (("bf16_fused", (1, 64, 128)),
                           ("bf16", (64,)), ("f32", (64,)),
                           ("int8_fused", (128,))):
        for batch in batches:
            cps = bench_ours(batch, dtype)
            results[f"{dtype}_b{batch}"] = round(cps, 3)
            # int8 is an opt-in accuracy/throughput trade (quant_int8);
            # the headline number stays on the numerics-preserving dtypes
            if cps > best[0] and not dtype.startswith("int8"):
                best = (cps, batch, dtype)

    p50 = bench_transfer_latency()
    p50_min = bench_transfer_latency(early_stop=True, dtype="int8")
    torch_clips_per_sec = bench_torch_cpu_baseline()

    flops_per_clip = denoiser_flops_per_clip_step() * DDPM_STEPS
    achieved_tflops = best[0] * flops_per_clip / 1e12
    out = {
        "metric": NORTH_STAR,
        "value": round(best[0], 3),
        "unit": "clips/s",
        "vs_baseline": round(best[0] / torch_clips_per_sec, 2),
        "best_batch": best[1],
        "best_dtype": best[2],
        "torch_cpu_baseline_clips_per_sec": round(torch_clips_per_sec, 4),
        "p50_transfer_latency_ms_ddim20_skip14": round(p50 * 1e3, 2),
        # min-latency preset: early-stop at the demo's dump[-5] pick (2
        # denoiser evals, bit-identical output) + int8 serving
        "p50_min_latency_preset_ms": round(p50_min * 1e3, 2),
        "achieved_tflops_per_sec": round(achieved_tflops, 1),
        "mfu_pct_v5e_bf16": round(100.0 * achieved_tflops / V5E_BF16_PEAK_TFLOPS, 1),
        "sweep": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    err = probe_backend()
    if err:
        emit_error(NORTH_STAR, err)
        sys.exit(0)  # the error line IS the parseable result
    enable_compile_cache()
    try:
        if "--full" in sys.argv:
            main_full()
        else:
            main()
    except Exception as e:
        emit_error(NORTH_STAR, f"{type(e).__name__}: {e}"[:300])
