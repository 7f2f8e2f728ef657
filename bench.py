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
import time

import numpy as np

C, T_FRAMES = 181, 196
DDPM_STEPS = 1000
LATENT, LAYERS, HEADS, FF = 512, 8, 4, 1024


def bench_ours(batch: int, dtype: str, reps: int = 3) -> float:
    """Returns clips/sec for one full 1000-step DDPM sampling of `batch` clips."""
    import jax
    import jax.numpy as jnp

    from motionstyle.diffusion import sampling
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    cfg = MDMConfig(njoints=C, nfeats=1, latent_dim=LATENT, ff_size=FF, num_layers=LAYERS,
                    num_heads=HEADS, dtype="bfloat16" if dtype == "bf16" else "float32")
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


def bench_transfer_latency(reps: int = 10) -> float:
    """p50 latency (s) of the demo config: DDIM-20, skip 14, inpainting, B=1."""
    import jax
    import jax.numpy as jnp

    from motionstyle.data.masks import get_inpainting_mask
    from motionstyle.diffusion import sampling
    from motionstyle.diffusion.ddpm import Inpainting
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    cfg = MDMConfig(njoints=C, nfeats=1, latent_dim=LATENT, ff_size=FF, num_layers=LAYERS, num_heads=HEADS)
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
        return sampling.sample_loop(
            sched, model_fn, {"enc_text": enc_text}, rng, shape=(1, C, 1, Tx),
            init_image=content, method="ddim", skip_timesteps=14,
            inpainting=Inpainting(mask, content), dump_all_xstart=True, remat=False,
        )[-5]

    jax.block_until_ready(run(jax.random.PRNGKey(2)))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(3 + i)))
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50))


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
    betas = np.linspace(1e-4, 0.02, DDPM_STEPS)
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


def main():
    torch_clips_per_sec = bench_torch_cpu_baseline()

    best = (0.0, None, None)
    results = {}
    for dtype in ("bf16", "f32"):
        for batch in (1, 32, 64):
            cps = bench_ours(batch, dtype)
            results[f"{dtype}_b{batch}"] = round(cps, 3)
            if cps > best[0]:
                best = (cps, batch, dtype)

    p50 = bench_transfer_latency()
    out = {
        "metric": "clips/sec/chip (1000-step DDPM, Xia 196-frame)",
        "value": round(best[0], 3),
        "unit": "clips/s",
        "vs_baseline": round(best[0] / torch_clips_per_sec, 2),
        "best_batch": best[1],
        "best_dtype": best[2],
        "torch_cpu_baseline_clips_per_sec": round(torch_clips_per_sec, 4),
        "p50_transfer_latency_ms_ddim20_skip14": round(p50 * 1e3, 2),
        "sweep": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
