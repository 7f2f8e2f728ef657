"""Long-form generation beyond the training horizon: windowed outpainting.

The denoiser is trained at a fixed clip length W (76 Xia / 196 HumanML —
the reference never samples past it; it has no long-form path at all). This
module chains fixed-shape windows: window k > 0 is sampled with its first
`overlap` frames inpainted to the previous window's tail (the same
Inpainting blend the style pipeline uses, here masking the TIME axis for
all channels), so each window continues the last one exactly. A full-length
`content` + `content_mask` may additionally be supplied — each window then
also preserves its slice of the content (e.g. the root_horizontal channels
of a LONG content clip), which extends the style-transfer contract itself
past the training horizon.

Why this stitches seamlessly: generation happens in normalized hml_vec
FEATURE space, where root motion is stored as per-frame velocities and only
decoded to positions by one cumsum over the full concatenated sequence
(core/features.py recover_root_rot_pos). Local velocities compose, so
window boundaries cannot teleport the root — continuity is structural.

TPU shape: every window has the same (B, C, 1, W) shape, so ONE compiled
sampler executable serves any target length; the host loop only swaps
buffers. rng is folded per window.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

from motionstyle.diffusion.ddpm import Inpainting


def plan_windows(n_frames: int, window: int, overlap: int):
    """(number of windows, per-window fresh-frame stride)."""
    if n_frames <= window:
        return 1, n_frames
    stride = window - overlap
    assert stride > 0, "overlap must be < window"
    extra = -(-(n_frames - window) // stride)  # ceil
    return 1 + extra, stride


def longform_stream(
    run_window: Callable,
    n_frames: int,
    window: int,
    overlap: int = 10,
    rng: Optional[jax.Array] = None,
    content: Optional[np.ndarray] = None,
    content_mask: Optional[np.ndarray] = None,
):
    """Generator form of longform_sample: yields (frame_offset, chunk) with
    chunk (B, C, 1, t) as each window completes, so a serving frontend can
    deliver a long job progressively (serve/server.py /v1/stream) — first
    motion after ONE window's latency instead of the whole chain's.
    Concatenating the chunks equals longform_sample bit for bit (same rng
    folding per window; longform_sample IS this generator, drained)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    n_windows, stride = plan_windows(n_frames, window, overlap)
    if content is not None:
        content = np.asarray(content, np.float32)
        # default mask BEFORE padding: pad frames must be mask=0 (generated)
        # like the explicit-mask path, not frozen synthetic zeros
        content_mask = (np.ones_like(content) if content_mask is None
                        else np.asarray(content_mask, np.float32))
        need = window + (n_windows - 1) * stride
        if content.shape[-1] < need:
            pad = np.zeros(content.shape[:-1] + (need - content.shape[-1],),
                           np.float32)
            content = np.concatenate([content, pad], axis=-1)
            content_mask = np.concatenate([content_mask,
                                           np.zeros_like(pad)], axis=-1)

    def window_inputs(k: int, prev_tail):
        off = k * stride
        if content is not None:
            init = content[..., off:off + window].copy()
            mask = content_mask[..., off:off + window].copy()
        else:
            init = mask = None
        if prev_tail is not None:
            if init is None:
                init = np.zeros(prev_tail.shape[:-1] + (window,), np.float32)
                mask = np.zeros_like(init)
            init[..., :overlap] = prev_tail
            mask[..., :overlap] = 1.0
        if init is None:
            return None, None
        return init, Inpainting(mask=mask, motion=init)

    emitted = 0
    tail = None
    for k in range(n_windows):
        init, inp = window_inputs(k, tail)
        out = np.asarray(run_window(init, inp, jax.random.fold_in(rng, k)),
                         np.float32)
        # the inpainting blend guarantees out[..., :overlap] == tail exactly
        chunk = out if k == 0 else out[..., overlap:]
        # overlap=0 (independent windows): out[..., -0:] would be the FULL
        # window, corrupting the next init's empty slice assignment
        tail = out[..., -overlap:] if overlap else None
        chunk = chunk[..., :n_frames - emitted]  # clip the final window
        if chunk.shape[-1]:
            yield emitted, chunk
            emitted += chunk.shape[-1]


def longform_sample(
    run_window: Callable,
    n_frames: int,
    window: int,
    overlap: int = 10,
    rng: Optional[jax.Array] = None,
    content: Optional[np.ndarray] = None,
    content_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Chain windows to (B, C, 1, n_frames) of normalized features.

    run_window(init_image (B,C,1,W) | None, inpainting | None, rng) ->
    (B, C, 1, W) — typically a ShardedSampler closure; called with identical
    shapes every window (compile once).

    content/content_mask (B, C, 1, >= n_frames): per-window slices are
    inpainted wherever content_mask is 1 (the long style-transfer use:
    preserve the content's root channels at every frame). The window-overlap
    continuity mask is OR-ed on top.
    """
    chunks = [c for _, c in longform_stream(
        run_window, n_frames, window, overlap=overlap, rng=rng,
        content=content, content_mask=content_mask)]
    return np.concatenate(chunks, axis=-1)
