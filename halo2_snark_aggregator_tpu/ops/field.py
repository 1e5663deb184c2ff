"""Vectorized BN254 field arithmetic for TPU (JAX reference implementation).

Representation: a field element is a `uint32[..., 16]` array of 16-bit limbs
(little-endian), kept in **Montgomery form** (a·2^256 mod p) between
operations. All ops are batched over arbitrary leading axes and jit/vmap/
shard_map-compatible (static shapes, `lax.scan` for carry chains).

Why 16-bit limbs in uint32: limb products fit a single uint32
((2^16-1)^2 < 2^32) and the lo/hi-split column sums of a 16-term convolution
stay under 2^21, so the whole schoolbook product + Montgomery REDC runs on the
VPU without any 64-bit arithmetic (TPUs have no native int64).

This is the vectorized equivalent of the reference's per-element host field
ops (SURVEY §2.6: "vectorized BN254 Fq/Fr limb arithmetic ... lane-parallel
over batches of field elements"). ops/field_pallas.py lowers the same
algorithm to a Pallas kernel; tests/test_field_ops.py differentially tests
both against ff/bn254.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff

LIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1
NBITS = LIMBS * LIMB_BITS  # 256


# ---------------------------------------------------------------------------
# Host-side limb codecs
# ---------------------------------------------------------------------------

def int_to_limbs(v: int) -> np.ndarray:
    return np.array([(v >> (LIMB_BITS * i)) & MASK for i in range(LIMBS)], dtype=np.uint32)


def limbs_to_int(a) -> int:
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(a[..., i]) << (LIMB_BITS * i) for i in range(LIMBS))


XFER_ROWS = 1 << 18  # bounded host<->device slices: whole-array transfers
                     # through the axon tunnel RESOURCE_EXHAUST at ~0.5GB
XFER_BYTES = 256 << 20  # per-slice byte cap (wide rows: a (32, 4M) int32
                        # order array is one 512MB row-sliced transfer)


def _xfer_rows(x) -> int:
    row_bytes = max(1, int(np.prod(x.shape[1:])) * x.dtype.itemsize)
    return max(1, min(XFER_ROWS, XFER_BYTES // row_bytes))


def dev_to_np(x) -> np.ndarray:
    """Device -> host in bounded slices along axis 0."""
    n = x.shape[0]
    rows = _xfer_rows(x)
    if n <= rows:
        return np.asarray(x)
    return np.concatenate([np.asarray(x[i : i + rows])
                           for i in range(0, n, rows)])


def np_to_dev(x):
    """Host -> device in bounded slices along axis 0 (device input: no-op
    concat of slices)."""
    import jax.numpy as _jnp
    n = x.shape[0]
    rows = _xfer_rows(x)
    if n <= rows:
        return _jnp.asarray(x)
    return _jnp.concatenate([_jnp.asarray(x[i : i + rows])
                             for i in range(0, n, rows)])


def rowwise_jit(fn, chunk: int = 1 << 16):
    """Wrap an elementwise-over-rows field op as a jitted function applied in
    fixed row chunks. The kernels in this module are written for jit fusion —
    ONE eager mont_mul at (4M,16) materializes ~16GB of conv intermediates —
    and at very large shapes even a fused whole-array program OOMs from
    padded temps; fixed 2^18-row chunks bound transients and give exactly two
    compiled shapes per op for any problem size."""
    jfn = jax.jit(fn)

    def run(*args):
        n = None
        for a in args:
            if hasattr(a, "ndim") and a.ndim == 2:
                n = a.shape[0] if n is None else max(n, a.shape[0])
        if n is None or n <= chunk:
            return jfn(*args)
        outs = []
        for i in range(0, n, chunk):
            sl = [a[i : i + chunk]
                  if (hasattr(a, "ndim") and a.ndim == 2 and a.shape[0] == n)
                  else a for a in args]
            outs.append(jfn(*sl))
        return jnp.concatenate(outs, axis=0)

    return run


def ints_to_std(vals) -> np.ndarray:
    """Bulk Python ints -> uint32[n, 16] standard-form limbs via one byte
    buffer (the per-element shift loop of ints_to_limbs is ~10x slower)."""
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype="<u2").reshape(len(vals), LIMBS).astype(np.uint32)


def std_to_ints(arr) -> list[int]:
    a = np.asarray(arr).astype("<u2")
    buf = a.tobytes()
    return [int.from_bytes(buf[i * 32 : (i + 1) * 32], "little")
            for i in range(a.shape[0])]


def ints_to_limbs(vs) -> np.ndarray:
    """Batched int_to_limbs via to_bytes + frombuffer (the per-element
    Python limb loop was the bench/verifier staging hot spot at 2^20+)."""
    if len(vs) == 0:
        return np.zeros((0, LIMBS), dtype=np.uint32)
    buf = b"".join(int(v).to_bytes(LIMBS * LIMB_BITS // 8, "little")
                   for v in vs)
    return np.frombuffer(buf, dtype="<u2").reshape(
        len(vs), LIMBS).astype(np.uint32)


def limbs_to_ints(arr) -> list[int]:
    arr = np.asarray(arr)
    flat = arr.reshape(-1, LIMBS)
    return [sum(int(row[i]) << (LIMB_BITS * i) for i in range(LIMBS)) for row in flat]


# ---------------------------------------------------------------------------
# Per-modulus constants
# ---------------------------------------------------------------------------

class FieldSpec:
    def __init__(self, modulus: int, name: str):
        self.modulus = modulus
        self.name = name
        self.p = int_to_limbs(modulus)
        # p' = -p^{-1} mod 2^256 (full-width Montgomery constant)
        self.p_inv_neg = int_to_limbs((-pow(modulus, -1, 1 << NBITS)) % (1 << NBITS))
        self.r_mont = (1 << NBITS) % modulus
        self.r2 = int_to_limbs(pow(1 << NBITS, 2, modulus))
        self.one_mont = int_to_limbs(self.r_mont)
        self.zero = np.zeros(LIMBS, dtype=np.uint32)

    def to_mont_int(self, v: int) -> np.ndarray:
        return int_to_limbs(v * (1 << NBITS) % self.modulus)

    def to_mont_ints(self, vs) -> np.ndarray:
        """Batched to_mont_int: uint32[n, LIMBS] (bytes-vectorized limb
        decomposition; the bigint Montgomery shift stays per element)."""
        m = self.modulus
        shift = 1 << NBITS
        return ints_to_limbs([v % m * shift % m for v in vs])

    def from_mont_limbs(self, a) -> int:
        return limbs_to_int(np.asarray(a)) * pow(1 << NBITS, -1, self.modulus) % self.modulus


FQ = FieldSpec(ff.P, "Fq")
FR = FieldSpec(ff.R, "Fr")


# ---------------------------------------------------------------------------
# Core limb kernels (jnp; shapes (..., LIMBS))
# ---------------------------------------------------------------------------

def _conv_columns(a, b, out_cols: int):
    """Column sums of the schoolbook product with lo/hi 16-bit splitting.

    Returns uint32[..., out_cols] redundant columns t with t[k] < 2^21,
    representing sum_k t[k] * 2^(16k) == a * b.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    prod = a[..., :, None] * b[..., None, :]  # (..., 16, 16) uint32, exact
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    ncols = 2 * LIMBS  # 32 columns (31 diagonals + 1 for the hi shift)
    # Scatter-free diagonal accumulation: row i of lo lands at offset i, row i
    # of hi at offset i+1. Static pads + a stacked sum compile much faster
    # than scatter-adds and fuse well on the VPU.
    rows = []
    zpad = [(0, 0)] * (len(shape) - 1)
    for i in range(LIMBS):
        rows.append(jnp.pad(lo[..., i, :], zpad + [(i, ncols - LIMBS - i)]))
        rows.append(jnp.pad(hi[..., i, :], zpad + [(i + 1, ncols - LIMBS - i - 1)]))
    z = jnp.sum(jnp.stack(rows, axis=0), axis=0, dtype=jnp.uint32)
    return z[..., :out_cols]


def _carry(cols, out_limbs: int):
    """Exact carry propagation: redundant columns -> proper 16-bit limbs.

    Returns (limbs uint32[..., out_limbs], carry_out uint32[...]).
    """
    ncols = cols.shape[-1]
    cols_t = jnp.moveaxis(cols, -1, 0)  # (ncols, ...)

    def step(carry, col):
        t = col + carry
        return t >> LIMB_BITS, t & MASK

    # init carry derived from the input so its shard_map varying-axes type
    # matches the loop output (a fresh constant would be "unvarying")
    carry_out, limbs_t = jax.lax.scan(step, cols[..., 0] & jnp.uint32(0), cols_t)
    limbs = jnp.moveaxis(limbs_t, 0, -1)
    if ncols < out_limbs:
        pad = [(0, 0)] * (limbs.ndim - 1) + [(0, out_limbs - ncols)]
        limbs = jnp.pad(limbs, pad)
        # carry_out flows into column ncols
        limbs = limbs.at[..., ncols].add(carry_out)
        carry_out = jnp.zeros_like(carry_out)
    return limbs[..., :out_limbs], carry_out


def _sub_limbs(a, b):
    """a - b with borrow scan. Returns (diff limbs, borrow_out in {0,1})."""
    a_t = jnp.moveaxis(a, -1, 0)
    b_t = jnp.moveaxis(b, -1, 0)

    def step(borrow, ab):
        ai, bi = ab
        t = ai - bi - borrow  # uint32 wraparound
        return (t >> LIMB_BITS) & 1, t & MASK

    borrow_out, d_t = jax.lax.scan(step, a[..., 0] & jnp.uint32(0), (a_t, b_t))
    return jnp.moveaxis(d_t, 0, -1), borrow_out


def _cond_sub_p(spec: FieldSpec, a):
    """a mod p for a < 2p: subtract p when a >= p."""
    p = jnp.asarray(spec.p)
    d, borrow = _sub_limbs(a, jnp.broadcast_to(p, a.shape))
    keep_a = (borrow == 1)[..., None]
    return jnp.where(keep_a, a, d)


def add(spec: FieldSpec, a, b):
    cols = a + b  # columns < 2^17
    limbs, carry = _carry(cols, LIMBS + 1)
    # a+b < 2p < 2^256 so carry-out into limb 16 may be nonzero only transiently
    s = limbs[..., :LIMBS]
    top = limbs[..., LIMBS]
    # if top set (sum >= 2^256, impossible for canonical inputs) ignore; cond-sub p
    del top, carry
    return _cond_sub_p(spec, s)


def sub(spec: FieldSpec, a, b):
    # (a + p) - b in [1, 2p): a+p < 2^255 so no overflow past limb 16
    p = jnp.asarray(spec.p)
    apb, _ = _carry(a + p, LIMBS + 1)
    d, _borrow = _sub_limbs(apb[..., :LIMBS], b)
    return _cond_sub_p(spec, d)


def neg(spec: FieldSpec, a):
    zero = jnp.zeros_like(a)
    return sub(spec, zero, a)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: a*b*2^-256 mod p, canonical output < p."""
    p = jnp.asarray(spec.p)
    p_inv = jnp.asarray(spec.p_inv_neg)
    # T = a*b, exact 32 limbs
    t_cols = _conv_columns(a, b, 2 * LIMBS)
    t_limbs, _ = _carry(t_cols, 2 * LIMBS)
    t_lo = t_limbs[..., :LIMBS]
    # m = (T mod 2^256) * p' mod 2^256
    m_cols = _conv_columns(t_lo, jnp.broadcast_to(p_inv, t_lo.shape), LIMBS)
    m_limbs, _ = _carry(m_cols, LIMBS)
    # U = T + m*p; divisible by 2^256
    mp_cols = _conv_columns(m_limbs, jnp.broadcast_to(p, m_limbs.shape), 2 * LIMBS)
    u_cols = mp_cols + t_limbs  # columns < 2^21 + 2^16
    u_limbs, _ = _carry(u_cols, 2 * LIMBS + 1)
    # R = U / 2^256 < 2p < 2^255, so limb 32 is always zero for canonical inputs
    r = u_limbs[..., LIMBS : 2 * LIMBS]
    return _cond_sub_p(spec, r)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a_std):
    return mont_mul(spec, a_std, jnp.broadcast_to(jnp.asarray(spec.r2), a_std.shape))


def from_mont(spec: FieldSpec, a_mont):
    one = jnp.zeros_like(a_mont).at[..., 0].set(1)
    return mont_mul(spec, a_mont, one)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """cond (...,) bool -> elementwise select of limb arrays."""
    return jnp.where(cond[..., None], a, b)


@functools.lru_cache(maxsize=8)
def _exp_bits(modulus: int, exponent: int):
    bits = [(exponent >> i) & 1 for i in range(exponent.bit_length())]
    return np.array(bits[::-1], dtype=np.int32)  # MSB first


def pow_const(spec: FieldSpec, a, exponent: int):
    """a^exponent (Montgomery in/out) via MSB-first square-and-multiply scan."""
    bits = jnp.asarray(_exp_bits(spec.modulus, exponent))
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape)

    def step(acc, bit):
        acc = mont_sqr(spec, acc)
        acc = select(jnp.broadcast_to(bit != 0, acc.shape[:-1]), mont_mul(spec, acc, a), acc)
        return acc, None

    acc, _ = jax.lax.scan(step, one, bits)
    return acc


def inv(spec: FieldSpec, a):
    """Batched inversion via Fermat: a^(p-2). inv(0) = 0."""
    return pow_const(spec, a, spec.modulus - 2)


def batch_inv_tree(spec: FieldSpec, a):
    """Montgomery-trick batch inversion along axis 0: one Fermat inversion +
    O(n) muls via parallel prefix/suffix products (log-depth scans).

    Zeros invert to zero (the whole-batch product trick is adapted by
    substituting 1 for zero entries). Amortizes the reference's per-element
    invert() calls (SURVEY §7 hard part 5).
    """
    zero_mask = is_zero(a)
    safe = select(zero_mask, jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape), a)

    def mul_op(x, y):
        return mont_mul(spec, x, y)

    prefix = jax.lax.associative_scan(mul_op, safe, axis=0)
    total_inv = inv(spec, prefix[-1])

    # suffix products: suffix[i] = prod_{j>i} safe[j]
    rev = jnp.flip(safe, axis=0)
    suffix_rev = jax.lax.associative_scan(mul_op, rev, axis=0)
    suffix = jnp.flip(suffix_rev, axis=0)
    suffix = jnp.concatenate([suffix[1:], jnp.broadcast_to(jnp.asarray(spec.one_mont), (1,) + a.shape[1:])], axis=0)

    prefix_shift = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(spec.one_mont), (1,) + a.shape[1:]), prefix[:-1]], axis=0
    )
    invs = mul_op(mul_op(prefix_shift, suffix), jnp.broadcast_to(total_inv, a.shape))
    invs = select(zero_mask, jnp.zeros_like(invs), invs)
    return invs
