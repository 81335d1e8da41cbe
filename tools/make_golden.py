"""Golden-fixture generator for the three queries DuckDB cannot express.

Computes expected outputs for `minhash_lsh_pairs`, `simhash_pairs`, and
`media_features` with an INDEPENDENT pure-Python/NumPy implementation —
no Spark anywhere in this file; the xxhash64 family comes from
bayesian_bm25_js_spark/functions/xxh64.py, a from-spec XXH64 port whose
parity with Spark is pinned separately (tests/test_xxh64.py). The
results are frozen as parquet under tests/golden/, and oracle_sql()
exposes them to the correctness driver via DuckDB read_parquet().

Run: python tools/make_golden.py [sf_dir] (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import hashlib
import math
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_bm25_js_spark.functions.xxh64 import (
    spark_xxhash64,
    xxh64_int_np,
    xxh64_long_np,
)

TOKEN_RE = re.compile(r"[^a-z0-9]+")
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def round_half_up(x: float, nd: int = 6) -> float:
    """Spark's round(): BigDecimal HALF_UP on the shortest decimal repr."""
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def tokenize(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split(text.lower()) if t]


def read_documents(sf_dir: str):
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()


def shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    """Distinct signed-int64 xxhash64(seed 42) of k-gram shingles;
    docs shorter than k get one whole-doc shingle (operator contract)."""
    n = max(1, len(tokens) - (k - 1))
    hs = {spark_xxhash64(" ".join(tokens[i : i + k])) for i in range(n)}
    return np.array(sorted(hs), dtype=np.int64)


def minhash_golden(doc_ids, texts, n_hashes=64, shingle_k=3, n_bands=16, threshold=0.5):
    rows_per_band = n_hashes // n_bands
    sigs = {}
    for did, text in zip(doc_ids, texts):
        sh = shingle_hashes(tokenize(text), shingle_k).view(np.uint64)
        # sig[i] = min over shingles of chained xxhash64(sh_long, i_int)
        seeds = xxh64_long_np(sh, 42)  # (n_shingles,)
        sig = np.empty(n_hashes, dtype=np.int64)
        for i in range(n_hashes):
            hs = xxh64_int_np(np.full(len(seeds), i, dtype=np.uint64), seeds)
            sig[i] = hs.view(np.int64).min()
        sigs[did] = sig

    # band buckets
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sig in sigs.items():
        for b in range(n_bands):
            sl = sig[b * rows_per_band : (b + 1) * rows_per_band]
            bh = spark_xxhash64(",".join(str(int(v)) for v in sl))
            buckets.setdefault((b, bh), []).append(did)

    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    out = []
    for a, b in sorted(cand):
        est = float(np.count_nonzero(sigs[a] == sigs[b])) / n_hashes
        if est >= threshold:
            out.append((a, b, round_half_up(est)))
    return out


def simhash_golden(doc_ids, texts, max_distance=3, n_chunks=4):
    sims = {}
    for did, text in zip(doc_ids, texts):
        toks = tokenize(text)
        if not toks:
            sims[did] = 0
            continue
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        hs = np.array([spark_xxhash64(str(t)) for t in uniq], dtype=np.int64).view(np.uint64)
        w = counts.astype(np.int64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        s = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
        sim = np.uint64(0)
        for i in range(64):
            if s[i] > 0:
                sim |= np.uint64(1) << np.uint64(i)
        sims[did] = int(sim.view(np.int64) if hasattr(sim, "view") else sim)
        sims[did] = int(np.uint64(sim).astype(np.int64))

    width = 64 // n_chunks
    mask = (1 << width) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sim in sims.items():
        u = sim & ((1 << 64) - 1)
        for c in range(n_chunks):
            buckets.setdefault((c, (u >> (c * width)) & mask), []).append(did)

    cand = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    out = []
    for a, b in sorted(cand):
        ham = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
        if ham <= max_distance:
            out.append((a, b, ham))
    return out


def media_golden(n_rows=64, dim=16):
    """Independent recomputation of the fake-media feature pipeline:
    payload = UTF-8 bytes of sha256 hexdigest of str(id); feature =
    sha256(payload)-seeded uniform [-1, 1)."""
    modalities = ["image", "audio", "video"]
    out = []
    for i in range(n_rows):
        payload = hashlib.sha256(str(i).encode()).hexdigest().encode()
        digest = hashlib.sha256(payload).digest()
        rep = (digest * ((dim * 8) // len(digest) + 1))[: dim * 8]
        raw = np.frombuffer(rep, dtype=np.uint64)
        feat = (raw.astype(np.float64) / np.float64(2**64)) * 2.0 - 1.0
        out.append((i, modalities[i % 3], round_half_up(float(feat[0])), dim))
    return out


def media_real_golden(n_rows=48, dim=16):
    """Independent recomputation of the REAL-decode feature pipeline
    over multimodal.synthesize_real_media's deterministic payloads.
    The pixel/sample/luma arrays are pure integer functions of doc_id
    (mirrored here from the synthesizer's formulas); features are
    recomputed straight from the arrays — no PPM/WAV/Y4M codec runs in
    this file, so a codec bug cannot cancel out of the comparison."""

    def hist_feats(hist256):
        binned = hist256.astype(np.float64).reshape(dim, 256 // dim).sum(axis=1)
        total = binned.sum()
        return binned / total if total > 0 else binned

    out = []
    for i in range(n_rows):
        m = i % 3
        if m == 0:
            y, x, c = np.ogrid[0:6, 0:8, 0:3]
            rgb = ((i * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint32)
            luma = (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
            feat = hist_feats(np.bincount(luma.ravel(), minlength=256))
            modality = "image"
        elif m == 1:
            j = np.arange(128)
            samples = (((i * 97 + j * 53) % 65536) - 32768).astype(np.int64)
            bins = ((samples + 32768) * 256) // 65536
            feat = hist_feats(np.bincount(bins, minlength=256))
            modality = "audio"
        else:
            f, y, x = np.ogrid[0:2, 0:6, 0:4]
            luma = ((i * 13 + f * 29 + y * 5 + x * 17) % 256).astype(np.uint8)
            feat = hist_feats(np.bincount(luma.ravel(), minlength=256)[:256])
            modality = "video"
        out.append(
            (
                i,
                modality,
                round_half_up(float(feat[0])),
                round_half_up(float(feat[7])),
                round_half_up(float(feat[15])),
                dim,
            )
        )
    return out


def _seq_dot(a, b) -> float:
    """Left-to-right float64 dot — mirrors the engine's zip_with +
    aggregate accumulation order (similarity._dot), not NumPy's
    pairwise summation."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


# proximity workload — MUST mirror __spark_entry__.PROX_SET / PROX_WINDOW
PROX_SET = [
    ["hash", "join"],
    ["table", "scan"],
    ["spark", "window"],
    ["value", "table", "part"],
    ["join"],
]
PROX_WINDOW = 8
PROX_K1, PROX_B, PROX_TOPK = 1.2, 0.75, 10


def proximity_golden(doc_ids, texts, queries=PROX_SET, window=PROX_WINDOW):
    """Independent brute-force oracle for operators/phrase.proximity_topk:
    enumerate EVERY (s, e) token window of span <= `window`, keep those
    covering all the query's distinct terms that are minimal (shrinking
    either end loses coverage), count them as tf, then score the
    pseudo-term with lucene idf and the engine's round(score,6)/doc_id
    ranking. Window enumeration here vs the engine's two-pointer merge
    — algorithmically disjoint implementations."""
    toks = {d: tokenize(t) for d, t in zip(doc_ids, texts)}
    n_docs = len(doc_ids)
    avgdl = sum(len(v) for v in toks.values()) / max(1, n_docs)

    def covered(seg, terms):
        return terms <= set(seg)

    rows = []
    for qid, q in enumerate(queries):
        terms = set(q)
        matched = {}
        for did in doc_ids:
            tk = toks[did]
            n = 0
            for s in range(len(tk)):
                for e in range(s, min(len(tk), s + window)):
                    if (
                        covered(tk[s : e + 1], terms)
                        and not covered(tk[s + 1 : e + 1], terms)
                        and not covered(tk[s:e], terms)
                    ):
                        n += 1
            if n:
                matched[did] = n
        pdf = len(matched)
        idf = math.log(1.0 + (n_docs - pdf + 0.5) / (pdf + 0.5))
        scored = []
        for did, tf in matched.items():
            dl = len(toks[did])
            tfn = (tf * (PROX_K1 + 1.0)) / (
                tf + PROX_K1 * (1.0 - PROX_B + PROX_B * dl / avgdl)
            )
            scored.append((did, tf, idf * tfn))
        scored.sort(key=lambda r: (-round_half_up(r[2]), r[0]))
        for rank, (did, tf, score) in enumerate(scored[:PROX_TOPK], 1):
            rows.append((qid, rank, did, tf, round_half_up(score)))
    return rows


def ivf_probe_golden(sf_dir: str, n_cells=8, n_iters=3, n_probe=2, k_wide=40, k=10):
    """Independent pure-Python mirror of similarity.ivf_build +
    ivf_topk at n_probe < n_cells — the PRUNED path (recall < 1 by
    construction), which no SQL oracle can express because the probe
    set depends on the k-means quantizer.

    Replicates the engine's determinism rules exactly:
    * seeds = n_cells vectors with smallest (xxhash64(vec_id), vec_id);
    * assignment = argmax dot, ties to the LOWEST cell id;
    * Lloyd update = per-cell mean then L2 normalize, empty cells keep
      their centroid;
    * probes = n_probe cells by descending (dot, cell id) — the
      engine's reverse(array_sort(struct(dot, cell))) order;
    * wide top-40 by raw (cos desc, vec_id asc), re-ranked on
      round(cos, 6) per the engine float policy, top 10.
    """
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    vec_ids = np.array(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    V = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    Vn = np.array(
        [[x / (_seq_dot(v, v) ** 0.5) for x in v] for v in V], dtype=np.float64
    )

    h = xxh64_long_np(vec_ids.view(np.uint64), 42).view(np.int64)
    order = np.lexsort((vec_ids, h))
    centroids = [list(Vn[i]) for i in order[:n_cells]]

    def assign():
        cells = np.empty(len(Vn), dtype=np.int64)
        for i, v in enumerate(Vn):
            dots = [_seq_dot(v, c) for c in centroids]
            cells[i] = int(np.argmax(dots))  # first max = lowest cell
        return cells

    for _ in range(n_iters):
        cells = assign()
        new = []
        for ci, old in enumerate(centroids):
            members = Vn[cells == ci]
            if len(members) == 0:
                new.append(old)
                continue
            vec = [float(np.mean(members[:, p])) for p in range(Vn.shape[1])]
            norm = sum(x * x for x in vec) ** 0.5
            new.append([x / norm for x in vec] if norm > 0 else old)
        centroids = new
    cells = assign()

    out = []
    for qid in sorted(vec_ids[vec_ids < 5]):
        qv = Vn[np.nonzero(vec_ids == qid)[0][0]]
        cd = [_seq_dot(qv, c) for c in centroids]
        probes = sorted(range(n_cells), key=lambda i: (-cd[i], -i))[:n_probe]
        cand = np.nonzero(np.isin(cells, probes))[0]
        scored = [(int(vec_ids[i]), _seq_dot(Vn[i], qv)) for i in cand]
        wide = sorted(scored, key=lambda t: (-t[1], t[0]))[:k_wide]
        final = sorted(wide, key=lambda t: (-round_half_up(t[1]), t[0]))[:k]
        for rank, (vid, cos) in enumerate(final, 1):
            out.append((int(qid), rank, vid, round_half_up(cos)))
    return out


# ---------------------------------------------------------------------------
# parameter estimation (scorer.ts:199-446)
# ---------------------------------------------------------------------------

def _imul32(a: int, b: int) -> int:
    return (a * b) & 0xFFFFFFFF


def _mulberry32_js(seed: int):
    """mulberry32 from the reference spec (scorer.ts:47-55), re-derived
    here with unsigned 32-bit arithmetic — congruent mod 2^32 with the
    JS int32 ops, and the final >>> 0 makes the output unsigned. NO
    engine imports: this mirror must fail if the engine's PRNG drifts."""
    s = seed & 0xFFFFFFFF

    def rng() -> float:
        nonlocal s
        s = (s + 0x6D2B79F5) & 0xFFFFFFFF
        t = _imul32(s ^ (s >> 15), s | 1)
        t = ((t + _imul32(t ^ (t >> 7), t | 61)) & 0xFFFFFFFF) ^ t
        return ((t ^ (t >> 14)) & 0xFFFFFFFF) / 4294967296.0

    return rng


def _sample_without_replacement_js(n: int, size: int, rng) -> list:
    """Fisher-Yates then head slice (scorer.ts:57-68)."""
    arr = list(range(n))
    for i in range(n - 1, 0, -1):
        j = int(rng() * (i + 1))
        arr[i], arr[j] = arr[j], arr[i]
    return arr[:size]


def _median_js(values: np.ndarray) -> float:
    s = np.sort(values)
    mid = len(s) // 2
    if len(s) % 2 == 0:
        return float((s[mid - 1] + s[mid]) / 2)
    return float(s[mid])


def estimation_golden(doc_ids, texts, k1=1.2, b=0.75):
    """(alpha, beta, base_rate x {percentile, mixture, elbow}) for the
    documents table — a from-spec NumPy mirror of the reference's
    pseudo-query estimation pipeline (scorer.ts:199-446 with lucene
    idf, bm25.ts:96-99), independent of every engine module. Scores
    are accumulated per doc in ascending doc_id order like the
    reference's dense score array (bm25.ts:105-126)."""
    toks = {int(d): tokenize(t) for d, t in zip(doc_ids, texts)}
    ordered_ids = sorted(toks)
    n = len(ordered_ids)
    dls = {d: len(toks[d]) for d in ordered_ids}
    avgdl = sum(dls.values()) / n if n else 0.0
    # postings: term -> {doc_id: tf}
    postings: dict = {}
    for d in ordered_ids:
        for t in toks[d]:
            postings.setdefault(t, {})
            postings[t][d] = postings[t].get(d, 0) + 1
    idf = {
        t: math.log(1.0 + (n - len(ds) + 0.5) / (len(ds) + 0.5))
        for t, ds in postings.items()
    }

    def bm25_scores(query):
        scores = {d: 0.0 for d in ordered_ids}
        for term in query:  # duplicates double-count (bm25.ts:110)
            ds = postings.get(term)
            if ds is None:
                continue
            for d, tf in ds.items():
                tf_norm = (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * (dls[d] / avgdl))
                )
                scores[d] += idf[term] * tf_norm
        return [scores[d] for d in ordered_ids]

    rng = _mulberry32_js(42)
    sample = _sample_without_replacement_js(n, min(n, 50), rng)
    per_query = []
    for idx in sample:
        q = toks.get(idx, [])[:5]
        if not q:
            continue
        nonzero = [s for s in bm25_scores(q) if s > 0]
        if nonzero:
            per_query.append(np.asarray(nonzero, dtype=np.float64))

    pooled = np.concatenate(per_query)
    beta = _median_js(pooled)
    mean = float(np.sum(pooled)) / len(pooled)
    std = math.sqrt(float(np.sum((pooled - mean) ** 2)) / len(pooled))
    alpha = 1.0 / std if std > 0 else 1.0

    # percentile (scorer.ts:276-300)
    ratios = []
    for scores in per_query:
        s = np.sort(scores)
        p_idx = math.ceil(len(s) * 0.95) - 1
        threshold = s[max(0, p_idx)]
        ratios.append(int(np.count_nonzero(scores >= threshold)) / n)
    br_pct = max(1e-6, min(0.5, sum(ratios) / len(ratios)))

    # mixture EM (scorer.ts:303-406)
    median_val = _median_js(pooled)
    lo = pooled[pooled <= median_val]
    hi = pooled[pooled > median_val]
    mu0 = float(np.mean(lo)) if len(lo) else median_val - 1.0
    mu1 = float(np.mean(hi)) if len(hi) else median_val + 1.0
    var0 = max(float(np.mean((lo - mu0) ** 2)) if len(lo) else 1.0, 1e-8)
    var1 = max(float(np.mean((hi - mu1) ** 2)) if len(hi) else 1.0, 1e-8)
    pi1, nn = 0.5, len(pooled)
    for _ in range(20):
        std0, std1 = math.sqrt(var0), math.sqrt(var1)
        lp0 = -0.5 * ((pooled - mu0) / std0) ** 2 - math.log(std0)
        lp1 = -0.5 * ((pooled - mu1) / std1) ** 2 - math.log(std1)
        lw0 = math.log(max(1.0 - pi1, 1e-10)) + lp0
        lw1 = math.log(max(pi1, 1e-10)) + lp1
        ml = np.maximum(lw0, lw1)
        gamma = np.exp(lw1 - (ml + np.log(np.exp(lw0 - ml) + np.exp(lw1 - ml))))
        n1, n0 = float(np.sum(gamma)), float(np.sum(1.0 - gamma))
        if n0 < 1e-8 or n1 < 1e-8:
            break
        mu0 = float(np.sum((1.0 - gamma) * pooled)) / n0
        mu1 = float(np.sum(gamma * pooled)) / n1
        var0 = max(float(np.sum((1.0 - gamma) * (pooled - mu0) ** 2)) / n0, 1e-8)
        var1 = max(float(np.sum(gamma * (pooled - mu1) ** 2)) / n1, 1e-8)
        pi1 = n1 / nn
    br_mix = max(1e-6, min(0.5, pi1 if mu1 >= mu0 else 1.0 - pi1))

    # elbow (scorer.ts:409-446)
    desc = np.sort(pooled)[::-1]
    dx = len(desc) - 1
    dy = desc[-1] - desc[0]
    line_len = math.sqrt(dx * dx + dy * dy)
    i = np.arange(len(desc))
    dist = np.abs(dy * i - dx * (desc - desc[0])) / line_len
    knee = int(np.argmax(dist))
    br_elbow = max(1e-6, min(0.5, max(1, knee) / len(desc)))

    return {
        "n_pseudo_queries": len(per_query),
        "n_scores": int(len(pooled)),
        "alpha_r": round_half_up(alpha),
        "beta_r": round_half_up(beta),
        "br_percentile_r": round_half_up(br_pct),
        "br_mixture_r": round_half_up(br_mix),
        "br_elbow_r": round_half_up(br_elbow),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    doc_ids, texts = read_documents(sf_dir)

    mh = minhash_golden(doc_ids, texts)
    pq.write_table(
        pa.table(
            {
                "a": pa.array([r[0] for r in mh], pa.int64()),
                "b": pa.array([r[1] for r in mh], pa.int64()),
                "est_jaccard_r": pa.array([r[2] for r in mh], pa.float64()),
            }
        ),
        os.path.join(GOLDEN_DIR, "minhash_lsh_pairs.parquet"),
    )
    print(f"minhash_lsh_pairs: {len(mh)} rows")

    sh = simhash_golden(doc_ids, texts)
    pq.write_table(
        pa.table(
            {
                "a": pa.array([r[0] for r in sh], pa.int64()),
                "b": pa.array([r[1] for r in sh], pa.int64()),
                "hamming": pa.array([r[2] for r in sh], pa.int32()),
            }
        ),
        os.path.join(GOLDEN_DIR, "simhash_pairs.parquet"),
    )
    print(f"simhash_pairs: {len(sh)} rows")

    md = media_golden()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in md], pa.int64()),
                "modality": pa.array([r[1] for r in md], pa.string()),
                "f0_r": pa.array([r[2] for r in md], pa.float64()),
                "dim": pa.array([r[3] for r in md], pa.int32()),
            }
        ),
        os.path.join(GOLDEN_DIR, "media_features.parquet"),
    )
    print(f"media_features: {len(md)} rows")

    mr = media_real_golden()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in mr], pa.int64()),
                "modality": pa.array([r[1] for r in mr], pa.string()),
                "f0_r": pa.array([r[2] for r in mr], pa.float64()),
                "f7_r": pa.array([r[3] for r in mr], pa.float64()),
                "f15_r": pa.array([r[4] for r in mr], pa.float64()),
                "dim": pa.array([r[5] for r in mr], pa.int32()),
            }
        ),
        os.path.join(GOLDEN_DIR, "media_features_real.parquet"),
    )
    print(f"media_features_real: {len(mr)} rows")

    iv = ivf_probe_golden(sf_dir)
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array([r[0] for r in iv], pa.int64()),
                "rank": pa.array([r[1] for r in iv], pa.int32()),
                "vec_id": pa.array([r[2] for r in iv], pa.int64()),
                "cos_r": pa.array([r[3] for r in iv], pa.float64()),
            }
        ),
        os.path.join(GOLDEN_DIR, "ivf_probe_topk.parquet"),
    )
    print(f"ivf_probe_topk: {len(iv)} rows")

    px = proximity_golden(doc_ids, texts)
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array([r[0] for r in px], pa.int64()),
                "rank": pa.array([r[1] for r in px], pa.int32()),
                "doc_id": pa.array([r[2] for r in px], pa.int64()),
                "tf": pa.array([r[3] for r in px], pa.int32()),
                "score_r": pa.array([r[4] for r in px], pa.float64()),
            }
        ),
        os.path.join(GOLDEN_DIR, "proximity_topk.parquet"),
    )
    print(f"proximity_topk: {len(px)} rows")

    est = estimation_golden(doc_ids, texts)
    pq.write_table(
        pa.table(
            {k: pa.array([v], pa.int64() if isinstance(v, int) else pa.float64())
             for k, v in est.items()}
        ),
        os.path.join(GOLDEN_DIR, "estimation.parquet"),
    )
    print(f"estimation: {est}")


if __name__ == "__main__":
    main()
