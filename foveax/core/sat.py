"""Summed-area table construction and round-trip decode.

SAT[c, y, x] = sum_{y'<=y, x'<=x} frame[y', x', c]  (mod 2^32)

The reference builds this with three OpenCL launches: an RGBA8->u32 copy, a
per-row serial prefix sum and a per-column serial prefix sum (reference:
src/sat_encoder_encode_kernels.cl:1-74, src/sat_encoder.cc:67-135).  On TPU
the whole thing is two ``cumsum`` passes over a channel-leading planar uint32
layout — XLA lowers these to vectorized scans, and ``foveax.kernels.scan2d``
provides a blocked Pallas alternative for the memory-bound large-resolution
case.

uint32 wraparound is deliberate and load-bearing: at 8K the total sum
overflows 2^32, but 4-tap box-sum *differences* remain correct as long as
each box sum < 2^32 (see SURVEY.md section 5, "long-context" note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_sat(frame: jax.Array) -> jax.Array:
    """(H, W, 3) uint8 frame -> (3, H, W) uint32 inclusive SAT.

    Channel-leading planar layout keeps each (H, W) plane contiguous so both
    scan axes tile onto (8, 128) VPU lanes.
    """
    planes = frame.astype(jnp.uint32).transpose(2, 0, 1)
    sat = jnp.cumsum(planes, axis=2, dtype=jnp.uint32)
    sat = jnp.cumsum(sat, axis=1, dtype=jnp.uint32)
    return sat


def decode_sat(sat: jax.Array) -> jax.Array:
    """Invert a SAT back to the image — the round-trip check path.

    Equivalent to the reference's ``decode_kernel`` with delta=1 (reference:
    src/sat_decoder_decode_kernel.cl:1-58; the host launch there is broken —
    work_dim=0 at src/sat_decoder.cc:198 — foveax fixes that by construction).
    Returns (H, W, 3) uint8.
    """
    # Inclusive SAT: pixel = SAT[y,x] - SAT[y-1,x] - SAT[y,x-1] + SAT[y-1,x-1]
    # with the first row/column special-cased (reference decode_kernel
    # branches at src/sat_decoder_decode_kernel.cl:21-57).
    padded = jnp.pad(sat, ((0, 0), (1, 0), (1, 0)))
    img = padded[:, 1:, 1:] - padded[:, :-1, 1:] - padded[:, 1:, :-1] + padded[:, :-1, :-1]
    img = jnp.clip(img, 0, 255).astype(jnp.uint8)
    return img.transpose(1, 2, 0)
