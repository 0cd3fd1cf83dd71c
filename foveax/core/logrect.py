"""Log-rectilinear forward map: per-axis pixel deltas and the precomputed
sampling grid.

The transform is *separable*: the horizontal delta depends only on the output
column index and the vertical delta only on the output row index (reference:
src/sat_decoder_sample_rect_kernel.cl:243-295 computes a dense
(W+1)x(H+1)x2 int16 grid whose x-plane is constant along rows and y-plane
constant along columns).  foveax therefore stores two 1-D vectors — ``gx`` of
shape (W_out+1,) and ``gy`` of shape (H_out+1,) — which is both 4000x smaller
and the key to expressing the downstream gathers as cheap per-axis indexed
dense reads on TPU.

Math (float32, mirroring the OpenCL kernel):

    lam        = source_dim / (e - 1)
    delta(u)   = sign(u) * max(|u|, trunc(lam * (exp((2|u|/out_dim)^4) - 1)))
    grid[k]    = floor((delta(k-1-out_dim/2) + delta(k-out_dim/2)) / 2)

for k in [0, out_dim], i.e. the stored grid entry is the floor-average of the
deltas of two adjacent output texels (reference:
src/sat_decoder_sample_rect_kernel.cl:266-294).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# float32 value of exp(1.0f) - 1, as the OpenCL kernels compute it
# (reference: src/sat_decoder_sample_rect_kernel.cl:156-157).
_E_MINUS_1_F32 = np.float32(np.exp(np.float32(1.0))) - np.float32(1.0)


def lam(source_dim: int) -> np.float32:
    """Per-axis scale factor ``lambda = source_dim / (e - 1)`` in float32."""
    return np.float32(source_dim) / _E_MINUS_1_F32


def delta_1d(u: jax.Array, out_dim: int, source_dim: int) -> jax.Array:
    """Signed source-pixel offset for output-texel offset ``u`` from center.

    ``u`` is int32 (any shape); returns int32.  Mirrors the delta formula of
    src/sat_decoder_sample_rect_kernel.cl:269-290 in float32.
    """
    au = jnp.abs(u)
    t = (2.0 * au.astype(jnp.float32) / np.float32(out_dim)) ** 4
    mag = (lam(source_dim) * (jnp.exp(t) - np.float32(1.0))).astype(jnp.int32)
    mag = jnp.maximum(au, mag)
    return mag * jnp.sign(u)


def delta64(u: np.ndarray, out_dim: int, source_dim: int) -> np.ndarray:
    """float64 host-side delta — the authoritative grid math.

    Grids are precomputed once per resolution on the host, so they use
    float64 (XLA's float32 ``exp`` is ~33 ulps off exactly at the
    ``|u| = out_dim/2`` boundary where the true value lands on an integer,
    which would flip the truncation).  Device-side code receives the results
    as integer constants.
    """
    u = np.asarray(u, dtype=np.int64)
    au = np.abs(u).astype(np.float64)
    mag_f = (float(source_dim) / (np.e - 1.0)) * (
        np.exp((2.0 * au / out_dim) ** 4) - 1.0
    )
    mag = np.maximum(np.abs(u), np.trunc(mag_f).astype(np.int64))
    return mag * np.sign(u)


def delta_table(u_min: int, u_max: int, out_dim: int, source_dim: int) -> np.ndarray:
    """Inclusive LUT of delta values for u in [u_min, u_max], int32."""
    return delta64(
        np.arange(u_min, u_max + 1), out_dim, source_dim
    ).astype(np.int32)


def _grid_axis(out_dim: int, source_dim: int) -> np.ndarray:
    """1-D averaged grid vector of shape (out_dim + 1,), int16 (host)."""
    # Grid entry k covers thread index k; texel offset u = (k-1) - out_dim//2.
    k = np.arange(out_dim + 1, dtype=np.int64)
    u = k - 1 - out_dim // 2
    d0 = delta64(u, out_dim, source_dim)
    d1 = delta64(u + 1, out_dim, source_dim)
    return np.floor((d0 + d1) / 2.0).astype(np.int16)


def _point_grid_axis(out_dim: int, source_dim: int) -> np.ndarray:
    """1-D raw (non-averaged) grid vector of shape (out_dim,), int16.

    The ImageSampler baseline stores raw deltas without neighbour averaging
    (reference: src/image_sampler_sample_rect_kernel.cl:48-88).
    """
    i = np.arange(out_dim, dtype=np.int64)
    u = i - out_dim // 2
    return delta64(u, out_dim, source_dim).astype(np.int16)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LogRectGrid:
    """Precomputed separable sampling grid (the analog of SATDecoder's cached
    grid buffer, reference: src/sat_decoder.cc:139-174).

    ``gx``: (out_width + 1,) int16 — averaged x-deltas.
    ``gy``: (out_height + 1,) int16 — averaged y-deltas.
    """

    gx: jax.Array
    gy: jax.Array
    out_width: int = dataclasses.field(metadata=dict(static=True))
    out_height: int = dataclasses.field(metadata=dict(static=True))
    source_width: int = dataclasses.field(metadata=dict(static=True))
    source_height: int = dataclasses.field(metadata=dict(static=True))

    def dense(self) -> np.ndarray:
        """(out_height+1, out_width+1, 2) int16 dense grid, bit-identical to
        the reference's grid buffer layout — for parity tests only."""
        gx = np.asarray(self.gx)
        gy = np.asarray(self.gy)
        out = np.empty((gy.shape[0], gx.shape[0], 2), dtype=np.int16)
        out[..., 0] = gx[None, :]
        out[..., 1] = gy[:, None]
        return out


@functools.lru_cache(maxsize=32)
def make_grid(
    out_width: int, out_height: int, source_width: int, source_height: int
) -> LogRectGrid:
    """Build (and cache) the averaged log-rectilinear grid."""
    return LogRectGrid(
        gx=jnp.asarray(_grid_axis(out_width, source_width)),
        gy=jnp.asarray(_grid_axis(out_height, source_height)),
        out_width=out_width,
        out_height=out_height,
        source_width=source_width,
        source_height=source_height,
    )


@functools.lru_cache(maxsize=32)
def make_point_grid(
    out_width: int, out_height: int, source_width: int, source_height: int
) -> LogRectGrid:
    """Raw-delta grid used by the direct point-sampling baseline.

    ``gx``: (out_width,) int16, ``gy``: (out_height,) int16.
    """
    return LogRectGrid(
        gx=jnp.asarray(_point_grid_axis(out_width, source_width)),
        gy=jnp.asarray(_point_grid_axis(out_height, source_height)),
        out_width=out_width,
        out_height=out_height,
        source_width=source_width,
        source_height=source_height,
    )
