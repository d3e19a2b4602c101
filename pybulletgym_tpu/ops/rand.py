"""Counter-based stateless PRNG (Threefry-2x32, 20 rounds).

Replaces the reference's single host-side ``np_random`` stream
[ref: env_bases.py · BaseBulletEnv.seed]: there, one NumPy RandomState on the
host feeds every env's reset perturbations sequentially. Here randomness must
be (a) generated on-device inside a jitted step, (b) independent per env in a
batch, and (c) bitwise-reproducible under any sharding. A counter-based PRNG
gives all three: the value depends only on ``(seed, env_id, epoch, stream)``,
never on execution order or device placement.

All inputs are broadcastable uint32 arrays; everything is elementwise, so the
batch tiles the VPU exactly like the rest of the engine.
"""

from __future__ import annotations

import jax.numpy as jnp

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_PARITY = 0x1BD11BDA  # plain int: keeps kernels free of captured constants


def _rotl(x, d):
    return (x << jnp.uint32(d)) | (x >> jnp.uint32(32 - d))


def threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32, 20 rounds — same construction as JAX's core PRNG."""
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(c0, jnp.uint32) + k0
    x1 = jnp.asarray(c1, jnp.uint32) + k1
    k2 = k0 ^ k1 ^ jnp.uint32(_PARITY)
    ks = (k0, k1, k2)
    for block in range(5):
        rots = _ROT_A if block % 2 == 0 else _ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        inj = block + 1
        x0 = x0 + ks[inj % 3]
        x1 = x1 + ks[(inj + 1) % 3] + jnp.uint32(inj)
    return x0, x1


def _bits(seed, stream, env_id, epoch):
    """One uint32 of random bits per element of the broadcast shape."""
    r0, _ = threefry2x32(
        jnp.uint32(seed), jnp.uint32(stream), jnp.uint32(env_id), jnp.uint32(epoch)
    )
    return r0


def uniform(seed, stream, env_id, epoch, lo=0.0, hi=1.0, dtype=jnp.float32):
    """U[lo, hi) — 24-bit mantissa uniforms from one threefry call."""
    b = _bits(seed, stream, env_id, epoch)
    # 24-bit value fits int32; Mosaic lacks a direct u32->f32 cast
    u = (b >> jnp.uint32(8)).astype(jnp.int32).astype(dtype) * dtype(2**-24)
    return lo + (hi - lo) * u


def randint(seed, stream, env_id, epoch, n):
    """Uniform integer in [0, n) (n is a static Python int)."""
    return (_bits(seed, stream, env_id, epoch) % jnp.uint32(n)).astype(jnp.int32)
