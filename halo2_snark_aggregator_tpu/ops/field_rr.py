"""Carry-free redundant-limb Montgomery field arithmetic for TPU (JAX).

The scan-based canonical kernels in ops/field.py are exact but serialize on
carry propagation, which measures ~1000x slower than the elementwise work on
real TPU hardware (axon v5e probe: 62s for a 2^16 MSM). This module is the
performance representation:

  * base 2^8, 32 limbs stored as int32, **redundant**: limb values may exceed
    255; an element is sum(limb_i * 256^i) tracked with a static (trace-time)
    per-limb bound, so every op stays inside int32 with NO carry chains;
  * `normalize` is carry-free: byte-decomposition rounds (split+shifted adds)
    with top-byte spills folded back through 2^(256+8k) mod p *bytewise* (each
    fold product is split into lo/hi bytes added at adjacent limbs, so spill
    magnitudes shrink geometrically and the fixed 3-round schedule converges);
  * `mont_mul` is Montgomery CIOS with the 32 reduction steps unrolled at
    trace time: step i derives m_i = (T_i * mu) mod 256 — exact even on a
    redundant T_i since it is a congruence of the limb itself — adds m_i * p,
    and moves the eliminated limb's value one limb up. No scans, no while
    loops: the whole multiplier is a flat elementwise chain that XLA fuses;
  * values leave the redundant domain only at host boundaries (rr_to_host).

Together with the complete, comparison-free curve formulas in ops/curve_rr.py
this removes every sequential construct from the MSM inner loop
(SURVEY §7 hard part 2). Differentially tested against ff/bn254.py.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff

NLIMBS = 32
BASE_BITS = 8
BASE = 1 << BASE_BITS
BMASK = BASE - 1
NBITS = NLIMBS * BASE_BITS  # 256

NORM_BOUND = 10         # limb bound (bits) guaranteed after normalize()
MUL_INPUT_BOUND = 12    # mont_mul input requirement: 32*2^(2*12) < 2^29


def _int_to_limbs(v: int) -> np.ndarray:
    return np.array([(v >> (BASE_BITS * i)) & BMASK for i in range(NLIMBS)],
                    dtype=np.int32)


class RRSpec:
    def __init__(self, modulus: int, name: str):
        self.modulus = modulus
        self.name = name
        self.p = _int_to_limbs(modulus)
        self.mu = (-pow(modulus, -1, BASE)) % BASE  # -p^{-1} mod 2^8
        self.r_mont = (1 << NBITS) % modulus
        self.r2 = _int_to_limbs(pow(1 << NBITS, 2, modulus))
        self.one_mont = _int_to_limbs(self.r_mont)
        # fold[k] = 2^(256 + 8k) mod p, k = 0..7 (top limb of each < 2^6)
        self.fold = np.stack(
            [_int_to_limbs(pow(2, NBITS + BASE_BITS * k, modulus)) for k in range(8)]
        )

    def to_mont_int(self, v: int) -> np.ndarray:
        return _int_to_limbs(v * (1 << NBITS) % self.modulus)

    def from_mont_limbs(self, limbs) -> int:
        v = sum(int(x) << (BASE_BITS * i)
                for i, x in enumerate(np.asarray(limbs, dtype=np.int64)))
        return v * pow(1 << NBITS, -1, self.modulus) % self.modulus


FQ = RRSpec(ff.P, "Fq")
FR = RRSpec(ff.R, "Fr")


@dataclasses.dataclass
class RR:
    """A batch of redundant field elements: limbs int32[..., 32] plus the
    static (Python-int, trace-time) per-limb bound in bits.

    Registered as a pytree with `bound` as static aux data, so RR values flow
    through jit/scan/while_loop; loop carries must pin a fixed bound via
    `with_bound` (bounds may always be widened)."""

    limbs: jnp.ndarray
    bound: int  # every limb value < 2^bound

    @property
    def shape(self):
        return self.limbs.shape[:-1]


jax_tree_util = __import__("jax").tree_util
jax_tree_util.register_pytree_node(
    RR,
    lambda rr: ((rr.limbs,), rr.bound),
    lambda bound, children: RR(children[0], bound),
)


def with_bound(a: RR, bound: int) -> RR:
    assert bound >= a.bound, "bounds may only be widened"
    return RR(a.limbs, bound)


def mont_limbs_from_ints(spec: RRSpec, ints) -> np.ndarray:
    """Batched to_mont_int: int32[n, NLIMBS]. The Montgomery shift stays a
    per-element bigint mulmod (C-speed in CPython), but limb decomposition
    goes through to_bytes + frombuffer instead of a 32-iteration Python
    loop per element (~10x on large batches: MSM input staging, the
    batched verifier's entry-point marshaling)."""
    if len(ints) == 0:
        return np.zeros((0, NLIMBS), dtype=np.int32)
    m = spec.modulus
    shift = 1 << NBITS
    buf = b"".join((v % m * shift % m).to_bytes(NLIMBS, "little")
                   for v in ints)
    return np.frombuffer(buf, dtype=np.uint8).reshape(
        len(ints), NLIMBS).astype(np.int32)


def rr_from_host(spec: RRSpec, ints: list[int]) -> RR:
    from .field import np_to_dev

    # bounded-slice upload: one-shot transfers RESOURCE_EXHAUST the axon
    # tunnel at ~0.5 GB (hit at 2^22-point MSM staging: 512 MB per coord)
    return RR(np_to_dev(mont_limbs_from_ints(spec, ints)), 8)


def rr_to_host(spec: RRSpec, a: RR) -> list[int]:
    arr = np.asarray(a.limbs, dtype=np.int64).reshape(-1, NLIMBS)
    rinv = pow(1 << NBITS, -1, spec.modulus)
    return [
        sum(int(x) << (BASE_BITS * i) for i, x in enumerate(row))
        * rinv % spec.modulus
        for row in arr
    ]


def _shift_up(x, k: int):
    """x * 2^(8k) at the limb level, dropping (returning) the spilled top."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    kept = jnp.pad(x[..., : NLIMBS - k], pad)
    spilled = x[..., NLIMBS - k :]  # values at 2^(256 + 8j), j = 0..k-1
    return kept, spilled


def normalize(spec: RRSpec, a: RR) -> RR:
    """Carry-free renormalization to limb bound <= NORM_BOUND.

    Alternates byte-decomposition rounds with bytewise modular folds of the
    top spills; exact per-round limb/spill maxima are tracked as Python ints,
    so the (static, trace-time) schedule is self-verifying — if a bound ever
    failed to converge, tracing would assert, never miscompute."""
    limbs = a.limbs
    limb_max = (1 << a.bound) - 1
    spills: dict[int, tuple] = {}  # k -> (value_array, value_max)
    fold_top_max = int(spec.fold[:, NLIMBS - 1].max())  # < 2^6

    for _round in range(10):
        if limb_max < (1 << NORM_BOUND) and not spills:
            break
        # --- byte-decompose limbs ---
        nbytes = (limb_max.bit_length() + BASE_BITS - 1) // BASE_BITS
        out = limbs & BMASK
        out_max = min(limb_max, BMASK)
        for bi in range(1, nbytes):
            part = limbs >> (BASE_BITS * bi)
            if bi < nbytes - 1:
                part = part & BMASK
            part_max = min(limb_max >> (BASE_BITS * bi), BMASK)
            kept, spilled = _shift_up(part, bi)
            out = out + kept
            out_max += part_max
            for j in range(spilled.shape[-1]):
                prev = spills.get(j)
                if prev is None:
                    spills[j] = (spilled[..., j], part_max)
                else:
                    spills[j] = (prev[0] + spilled[..., j], prev[1] + part_max)
        limbs, limb_max = out, out_max

        # --- fold spills bytewise: v * 2^(256+8k) == v * fold[k] (mod p) ---
        new_spills: dict[int, tuple] = {}
        for k, (v, vmax) in spills.items():
            if vmax == 0:
                continue
            prod = v[..., None] * jnp.asarray(spec.fold[k])
            lo = prod & BMASK
            hi = prod >> BASE_BITS
            kept, spilled = _shift_up(hi, 1)
            limbs = limbs + lo + kept
            limb_max += min(vmax * BMASK, BMASK) + ((vmax * BMASK) >> BASE_BITS)
            re_max = (vmax * fold_top_max) >> BASE_BITS
            if re_max > 0:
                prev = new_spills.get(0)
                if prev is None:
                    new_spills[0] = (spilled[..., 0], re_max)
                else:
                    new_spills[0] = (prev[0] + spilled[..., 0], prev[1] + re_max)
        spills = new_spills
    else:
        raise AssertionError(f"normalize failed to converge: {limb_max}, {spills}")

    assert limb_max < (1 << NORM_BOUND)
    return RR(limbs, NORM_BOUND)


def add(spec: RRSpec, a: RR, b: RR) -> RR:
    out = RR(a.limbs + b.limbs, max(a.bound, b.bound) + 1)
    if out.bound > MUL_INPUT_BOUND:
        out = normalize(spec, out)
    return out


def _pad_constant(spec: RRSpec, bound: int) -> np.ndarray:
    """Multiple of p whose greedy limb split exceeds 2^bound everywhere."""
    need = 1 << bound
    m = (need << (BASE_BITS * (NLIMBS - 1) + 2)) // spec.modulus + 1
    pad_val = m * spec.modulus
    limbs = []
    rest = pad_val
    for _ in range(NLIMBS - 1):
        limb = (rest & BMASK) + need
        limbs.append(limb)
        rest = (rest - limb) >> BASE_BITS
    assert rest >= need, "padding too small"
    limbs.append(rest)
    arr = np.array(limbs, dtype=np.int64)
    assert arr.max() < (1 << 31)
    assert sum(int(x) << (BASE_BITS * i) for i, x in enumerate(arr)) == pad_val
    return arr.astype(np.int32)


_PAD_CACHE: dict = {}


def sub(spec: RRSpec, a: RR, b: RR) -> RR:
    """a - b + pad (pad a multiple of p dominating b limb-wise): borrow-free."""
    key = (spec.name, b.bound)
    if key not in _PAD_CACHE:
        _PAD_CACHE[key] = _pad_constant(spec, b.bound)
    pad = jnp.asarray(_PAD_CACHE[key])
    out = RR(a.limbs - b.limbs + pad, max(a.bound, b.bound + 2) + 1)
    if out.bound > MUL_INPUT_BOUND:
        out = normalize(spec, out)
    return out


def scale_small(spec: RRSpec, a: RR, k: int) -> RR:
    """Multiply by a small non-negative integer constant (e.g. b3 = 9)."""
    out = RR(a.limbs * k, a.bound + max(int(k).bit_length(), 1))
    if out.bound > MUL_INPUT_BOUND:
        out = normalize(spec, out)
    return out


def _conv(a_limbs, b_limbs):
    """Schoolbook 32x32 convolution columns (64 wide) via static pads.

    NOTE: a take_along_axis "skew gather" variant is 8x fewer XLA ops but
    general gathers lower to scalar loads on TPU (observed ~100x slower
    execution); static pads + adds stay fully vectorized. The products are
    formed one shifted row at a time — materializing the full
    (..., 32, 32) outer product as one tensor is a multi-GB HLO temp that
    the TPU buffer assigner does not always fuse away (measured 24G HBM
    for a 6-wide wave-batched mul over a 2^15 batch)."""
    zpad = [(0, 0)] * (a_limbs.ndim - 1)
    total = None
    for i in range(NLIMBS):
        row = jnp.pad(a_limbs[..., i : i + 1] * b_limbs,
                      zpad + [(i, NLIMBS - i)])
        total = row if total is None else total + row
    return total  # int32[..., 64]


def mont_mul(spec: RRSpec, a: RR, b: RR) -> RR:
    """Montgomery product with unrolled redundant CIOS reduction."""
    if a.bound > MUL_INPUT_BOUND:
        a = normalize(spec, a)
    if b.bound > MUL_INPUT_BOUND:
        b = normalize(spec, b)
    assert 5 + a.bound + b.bound <= 31, (a.bound, b.bound)
    t = _conv(a.limbs, b.limbs)  # cols < 32 * 2^(ba+bb) <= 2^29

    p = jnp.asarray(spec.p)
    mu = spec.mu
    zpad = [(0, 0)] * (t.ndim - 1)
    for i in range(NLIMBS):
        ti = t[..., i]
        m = ((ti & BMASK) * mu) & BMASK  # exact limb congruence mod 256
        upd = m[..., None] * p  # (..., 32) < 2^16
        t = t + jnp.pad(upd, zpad + [(i, NLIMBS - i)])
        ti_new = t[..., i]  # divisible by 256 by construction
        carry = ti_new >> BASE_BITS
        # move limb i entirely into limb i+1 (remove ti_new, add carry up)
        delta = jnp.stack([-ti_new, carry], axis=-1)
        t = t + jnp.pad(delta, zpad + [(i, 2 * NLIMBS - i - 2)])
    r = t[..., NLIMBS:]  # 32 cols; bound ~2^30
    return normalize(spec, RR(r, 30))


def mont_sqr(spec: RRSpec, a: RR) -> RR:
    return mont_mul(spec, a, a)


def select(cond, a: RR, b: RR) -> RR:
    return RR(jnp.where(cond[..., None], a.limbs, b.limbs), max(a.bound, b.bound))


def zeros_like(a: RR) -> RR:
    return RR(a.limbs & jnp.int32(0), 1)


def const_like(spec: RRSpec, a: RR, value_mont: np.ndarray) -> RR:
    zero = a.limbs & jnp.int32(0)
    return RR(zero + jnp.asarray(value_mont), 8)


# ---------------------------------------------------------------------------
# Exponentiation / inversion / canonicalization (batched-verifier support)
# ---------------------------------------------------------------------------

import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=8)
def _exp_bits_msb(exponent: int):
    bits = [(exponent >> i) & 1 for i in range(exponent.bit_length())]
    return _np.array(bits[::-1], dtype=_np.int32)


def pow_const(spec: RRSpec, a: RR, exponent: int) -> RR:
    """a^exponent via an MSB-first square-and-multiply lax.scan (2 muls/step)."""
    import jax

    a = normalize(spec, a) if a.bound > MUL_INPUT_BOUND else a
    a = with_bound(a, MUL_INPUT_BOUND)
    one = RR((a.limbs & jnp.int32(0)) + jnp.asarray(spec.one_mont), MUL_INPUT_BOUND)

    def step(acc_limbs, bit):
        acc = RR(acc_limbs, MUL_INPUT_BOUND)
        acc = mont_mul(spec, acc, acc)
        mul = mont_mul(spec, acc, a)
        limbs = jnp.where(bit != 0, mul.limbs, acc.limbs)
        return limbs, None

    bits = jnp.asarray(_exp_bits_msb(exponent))
    limbs, _ = jax.lax.scan(step, one.limbs, bits)
    return RR(limbs, NORM_BOUND)


def inv(spec: RRSpec, a: RR) -> RR:
    """Batched Fermat inversion (inv(0) = 0)."""
    return pow_const(spec, a, spec.modulus - 2)


def to_canonical16(spec: RRSpec, a: RR):
    """RR (Montgomery, redundant) -> canonical standard-form uint32[..., 16]
    16-bit limbs (ops/field layout), e.g. for MSM scalar digits.

    The one place exact carries are required; runs ONCE at a traced program's
    boundary: de-Montgomery via mont_mul(a, 1), byte-normalize, then a single
    32-step carry scan + up to 3 conditional subtracts of p."""
    import jax

    one_std = RR((a.limbs & jnp.int32(0)).at[..., 0].set(1), 1)
    v = mont_mul(spec, a, one_std)  # value mod p, redundant, bound <= 2^10
    limbs = v.limbs
    # exact carry to 8-bit limbs
    def carry_step(c, col):
        t = col + c
        return t >> BASE_BITS, t & BMASK

    cols = jnp.moveaxis(limbs, -1, 0)
    carry, out = jax.lax.scan(carry_step, limbs[..., 0] & jnp.int32(0), cols)
    out = jnp.moveaxis(out, 0, -1)  # canonical-ish: value < 2^256, < ~4p
    # conditional subtracts of p (value < 2^256 < 6p for both BN254 moduli)
    p = jnp.asarray(spec.p)

    def sub_borrow(x):
        def step(b, cols_):
            xi, pi = cols_
            t = xi - pi - b
            return (t >> 31) & 1, t & BMASK  # arithmetic shift: borrow flag

        xs = jnp.moveaxis(x, -1, 0)
        ps = jnp.moveaxis(jnp.broadcast_to(p, x.shape), -1, 0)
        borrow, d = jax.lax.scan(step, x[..., 0] & jnp.int32(0), (xs, ps))
        d = jnp.moveaxis(d, 0, -1)
        return jnp.where((borrow == 1)[..., None], x, d)

    # value < 2^256 < 6p for both BN254 moduli
    for _ in range(6):
        out = sub_borrow(out)
    # repack 8-bit limbs into 16-bit limbs (uint32 storage)
    lo = out[..., 0::2]
    hi = out[..., 1::2]
    return (lo + (hi << 8)).astype(jnp.uint32)
