"""Lockstep constants for the sketch surfaces (HLL cardinality).

ONE spec shared by the engine plan (plans/hits.py ``match_cardinality_hll``),
the relational Spark twin and the DuckDB oracle (driverq ``_match_hll_sql`` /
``_vocab_hll_sql``) — the same three-implementations-in-lockstep discipline
as the tokenizer (functions/extraction.py).

HLL spec (p = 8, m = 256, md5-based 60-bit hash):
  h      = int(md5(value)[:15 hex], 16)          # 60 bits
  bucket = h >> 52                                # top p bits
  w      = h & (2^52 - 1)                         # 52-bit tail
  rho    = 53 - bit_length(w)  (w = 0 -> 53)      # leading zeros + 1
  s53    = sum over ALL m registers of 2^(53 - reg), EXACT int64
           (absent registers contribute 2^53; max 256 * 2^53 = 2^61)
  raw    = HLL_ALPHA_M2 / s53  (one double division — the full numerator
           alpha_m * m^2 * 2^53 is ONE compile-time double literal, so
           every engine performs the identical single float op)
  est    = m * ln(m / zeros) if raw <= 2.5 m and zeros > 0 else raw
           (linear counting; ln inputs are small ints — every reachable
           (m, zeros) pair is pinned Spark == DuckDB == Python in tests)
  est6   = floor(est * 1e6) as int64
"""

from __future__ import annotations

import math

HLL_P = 8
HLL_M = 1 << HLL_P
HLL_W_BITS = 60 - HLL_P  # 52-bit tail below the bucket bits
HLL_W_MASK = (1 << HLL_W_BITS) - 1
HLL_RHO_MAX = HLL_W_BITS + 1  # 53: the w == 0 sentinel register value
# alpha_m * m^2 * 2^53 as ONE double literal (see module docstring).
HLL_ALPHA_M2 = (0.7213 / (1.0 + 1.079 / HLL_M)) * (HLL_M * HLL_M) * float(1 << 53)
HLL_LC_BAR = 2.5 * HLL_M  # linear-counting cutover on the raw estimate


def hll_estimate(zeros: int, s53: int) -> float:
    """Pure-Python oracle of the estimate tail (pytest cross-check)."""
    raw = HLL_ALPHA_M2 / float(s53)
    if raw <= HLL_LC_BAR and zeros > 0:
        return HLL_M * math.log(HLL_M / float(zeros))
    return raw


def hll_sketch(values) -> tuple[int, int]:
    """Pure-Python register builder -> (zeros, s53) for pytest oracles."""
    import hashlib

    regs = [0] * HLL_M
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        b, w = h >> HLL_W_BITS, h & HLL_W_MASK
        rho = HLL_RHO_MAX - w.bit_length() if w else HLL_RHO_MAX
        regs[b] = max(regs[b], rho)
    zeros = sum(1 for r in regs if r == 0)
    s53 = sum(1 << (53 - r) for r in regs)
    return zeros, s53
