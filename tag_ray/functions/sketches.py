"""Mergeable streaming sketches: Welford, t-digest, HyperLogLog.

The engine-only additions on top of the reference (SURVEY.md §2.5 A3):
the reference keeps only exact histogram maps in one consumer's heap
(cmd/check/main.go:127-131); at 10^12 rows those become mergeable
sketches so per-block partials can be combined associatively — which is
also exactly what makes them checkpointable (merge-idempotent partials
persisted per partition, north_rule "resumable from checkpoint").

All three follow the same protocol: ``add_array(np)`` (vectorized
accumulate), ``merge(other)`` (associative, commutative), ``to_bytes``/
``from_bytes`` (partial persistence). Implementations follow the
published algorithms: Welford/Chan parallel variance, Dunning's merging
t-digest (k1 scale function), Flajolet's HyperLogLog with small-range
linear counting.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------


class Welford:
    """Parallel mean/variance: (count, mean, M2) with Chan's merge."""

    __slots__ = ("n", "mean", "m2", "min", "max")

    def __init__(self):
        self.n = 0.0
        self.mean = 0.0
        self.m2 = 0.0
        self.min = np.inf
        self.max = -np.inf

    def add_array(self, x: np.ndarray) -> "Welford":
        x = np.asarray(x, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return self
        b = Welford()
        b.n = float(x.size)
        b.mean = float(x.mean())
        b.m2 = float(((x - b.mean) ** 2).sum())
        b.min = float(x.min())
        b.max = float(x.max())
        return self.merge(b)

    def merge(self, o: "Welford") -> "Welford":
        if o.n == 0:
            return self
        if self.n == 0:
            self.n, self.mean, self.m2 = o.n, o.mean, o.m2
            self.min, self.max = o.min, o.max
            return self
        d = o.mean - self.mean
        n = self.n + o.n
        self.m2 = self.m2 + o.m2 + d * d * self.n * o.n / n
        self.mean += d * o.n / n
        self.n = n
        self.min = min(self.min, o.min)
        self.max = max(self.max, o.max)
        return self

    @property
    def variance(self) -> float:  # population variance (matches SQL var_pop)
        return self.m2 / self.n if self.n > 0 else float("nan")

    @property
    def sample_variance(self) -> float:  # matches SQL var_samp
        return self.m2 / (self.n - 1) if self.n > 1 else float("nan")


# ---------------------------------------------------------------------------


class TDigest:
    """Dunning's merging t-digest (k1 scale function), numpy-vectorized.

    Mergeable + order-insensitive within documented accuracy; merge is
    associative enough for checkpointing (partials merged in any order
    give the same accuracy class, PAPERS.md quantile-sketch survey).
    """

    __slots__ = ("delta", "means", "weights")

    def __init__(self, delta: int = 128):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def add_array(self, x: np.ndarray) -> "TDigest":
        x = np.asarray(x, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return self
        self.means = np.concatenate([self.means, x])
        self.weights = np.concatenate([self.weights, np.ones(x.size)])
        if self.means.size > 8 * self.delta:
            self._compress()
        return self

    def merge(self, o: "TDigest") -> "TDigest":
        if o.means.size:
            self.means = np.concatenate([self.means, o.means])
            self.weights = np.concatenate([self.weights, o.weights])
            self._compress()
        return self

    def _compress(self):
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        # k1 scale: k(q) = delta/(2π)·asin(2q−1); centroid may span Δk ≤ 1
        q_right = np.cumsum(w) / total
        k = self.delta / (2 * np.pi) * np.arcsin(np.clip(2 * q_right - 1, -1, 1))
        out_m, out_w = [], []
        cur_m, cur_w, k_left = m[0], w[0], None
        k_left = self.delta / (2 * np.pi) * np.arcsin(-1.0)
        for i in range(1, m.size):
            if k[i] - k_left <= 1.0:
                cur_w += w[i]
                cur_m += (m[i] - cur_m) * w[i] / cur_w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                k_left = k[i - 1]
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        self._compress()
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def cdf(self, x: np.ndarray) -> np.ndarray:
        if self.means.size == 0:
            return np.full(np.shape(x), np.nan)
        self._compress()
        cum = np.cumsum(self.weights) - self.weights / 2
        return np.interp(x, self.means, cum / self.weights.sum(),
                         left=0.0, right=1.0)

    @property
    def n(self) -> float:
        return float(self.weights.sum())


# ---------------------------------------------------------------------------

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized 64-bit mixer."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= _SPLITMIX_C1
        x ^= x >> np.uint64(27)
        x *= _SPLITMIX_C2
        x ^= x >> np.uint64(31)
    return x


def hash64_any(values) -> np.ndarray:
    """Stable uint64 hash of a numeric/string array (vectorized)."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return _mix64(arr.astype(np.uint64))
    if arr.dtype.kind == "f":
        return _mix64(arr.astype(np.float64).view(np.uint64))
    from tag_ray.functions.hashing import hash_strings64
    return _mix64(hash_strings64(list(arr)))


class HyperLogLog:
    """Dense HLL, precision p (2^p registers), stochastic-averaging
    estimator with small-range linear counting (Flajolet et al. 2007)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if h.size == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = leading zeros of the remaining 64-p bits, + 1; the low p bits
        # are forced to 1 so rank is bounded without a special case
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        lz = np.zeros(h.size, dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        remaining = np.ones(h.size, dtype=bool)
        for _ in range(64 - self.p + 1):
            remaining &= (cur & mask) == 0
            if not remaining.any():
                break
            lz[remaining] += 1
            cur <<= np.uint64(1)
        np.maximum.at(self.registers, idx, lz + 1)
        return self

    def add_array(self, values) -> "HyperLogLog":
        return self.add_hashes(hash64_any(values))

    def merge(self, o: "HyperLogLog") -> "HyperLogLog":
        assert self.p == o.p
        np.maximum(self.registers, o.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(est)


# ---------------------------------------------------------------------------


class ColumnSketch:
    """Composite per-column state: moments + quantiles + distinct."""

    __slots__ = ("welford", "tdigest", "hll")

    def __init__(self, delta: int = 128, hll_p: int = 12):
        self.welford = Welford()
        self.tdigest = TDigest(delta)
        self.hll = HyperLogLog(hll_p)

    def add_numeric(self, x: np.ndarray) -> "ColumnSketch":
        self.welford.add_array(x)
        self.tdigest.add_array(x)
        x = np.asarray(x, dtype=np.float64)
        self.hll.add_hashes(hash64_any(x[~np.isnan(x)]))
        return self

    def merge(self, o: "ColumnSketch") -> "ColumnSketch":
        self.welford.merge(o.welford)
        self.tdigest.merge(o.tdigest)
        self.hll.merge(o.hll)
        return self

    def summary(self) -> dict:
        w = self.welford
        return {
            "count": int(w.n),
            "mean": w.mean,
            "variance": w.variance,
            "min": w.min if w.n else float("nan"),
            "max": w.max if w.n else float("nan"),
            "approx_distinct": int(round(self.hll.estimate())),
            "q50": self.tdigest.quantile(0.5),
            "q95": self.tdigest.quantile(0.95),
            "q99": self.tdigest.quantile(0.99),
        }

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"w": (self.welford.n, self.welford.mean, self.welford.m2,
                   self.welford.min, self.welford.max),
             "t": (self.tdigest.delta, self.tdigest.means, self.tdigest.weights),
             "h": (self.hll.p, self.hll.registers)})

    @classmethod
    def from_bytes(cls, b: bytes) -> "ColumnSketch":
        d = pickle.loads(b)
        s = cls(delta=d["t"][0], hll_p=d["h"][0])
        (s.welford.n, s.welford.mean, s.welford.m2,
         s.welford.min, s.welford.max) = d["w"]
        s.tdigest.means, s.tdigest.weights = d["t"][1], d["t"][2]
        s.hll.registers = d["h"][1]
        return s


class MisraGries:
    """Mergeable heavy-hitters sketch (Misra-Gries summary).

    Tracks at most ``k - 1`` candidate items; after any stream of n
    items, every true count is under-estimated by at most n/k, so any
    item with frequency > n/k is guaranteed present. Batched update:
    C-level ``value_counts`` per batch, then one bulk decrement by the
    k-th largest weight (the standard batched MG step — equivalent to
    repeating the unit decrement). Merging two sketches sums their
    weights and re-trims; the union error is bounded by n_total/k
    (Agarwal et al., "Mergeable Summaries", PODS'12 — public result).
    """

    def __init__(self, k: int = 64):
        self.k = k
        self.counts: dict = {}
        self.n = 0

    def _trim(self) -> None:
        if len(self.counts) < self.k:
            return
        w = np.sort(np.fromiter(self.counts.values(), dtype=np.int64))
        # decrement everything by the k-th largest weight: survivors
        # (c > d) number at most k-1, and each unit of decrement is
        # shared by ≥ k items, preserving the n/k error bound
        d = int(w[len(w) - self.k])
        self.counts = {v: c - d for v, c in self.counts.items() if c > d}

    def update_batch(self, values) -> None:
        vc = pd.Series(values).value_counts(sort=False)
        self.n += int(vc.sum())
        get = self.counts.get
        for v, c in vc.items():  # vocabulary-sized, not row-sized
            self.counts[v] = get(v, 0) + int(c)
        self._trim()

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(min(self.k, other.k))
        out.n = self.n + other.n
        out.counts = dict(self.counts)
        get = out.counts.get
        for v, c in other.counts.items():
            out.counts[v] = get(v, 0) + c
        out._trim()
        return out

    def heavy_hitters(self, min_frac: float = 0.01) -> "pd.DataFrame":
        """Candidates whose lower-bound count clears min_frac·n.
        Estimates are lower bounds (true count ≤ est + n/k)."""
        thr = self.n * min_frac - self.n / self.k
        items = [(v, c) for v, c in self.counts.items() if c >= thr]
        items.sort(key=lambda t: (-t[1], str(t[0])))
        return pd.DataFrame(items, columns=["item", "est_count"])
