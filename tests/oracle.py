"""Pure-Python oracle implementing the reference semantics exactly.

An independent, single-machine line-by-line port of the reference's
BM25 + BayesianBM25Scorer behavior (bm25.ts, scorer.ts) used ONLY as a
test oracle to cross-check the Spark engine's distributed dataflow
(joins, ordered aggregation, tie-breaks, sampling orchestration).
Scalar math uses the Python `math` module, matching JS float64 op for
op; probabilities reuse the NumPy kernel — the same bits the Spark
pandas UDF produces.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from bayesian_bm25_js_spark.functions.kernel import score_to_probability
from bayesian_bm25_js_spark.functions.prng import (
    mulberry32,
    sample_without_replacement,
)
from bayesian_bm25_js_spark.operators.estimate import (
    estimate_base_rate,
    estimate_parameters,
)


class OracleBM25:
    """In-memory BM25 with the reference's exact accumulation order."""

    def __init__(self, k1: float = 1.2, b: float = 0.75, method: str = "robertson"):
        self.k1 = k1
        self.b = b
        self.method = method
        self.num_docs = 0
        self.avgdl = 0.0
        self.doc_lengths: List[int] = []
        self.inverted: Dict[str, List[Tuple[int, int]]] = {}
        self.idf: Dict[str, float] = {}

    def index(self, corpus: Sequence[Sequence[str]]) -> None:
        self.num_docs = len(corpus)
        self.doc_lengths = [len(d) for d in corpus]
        total = 0
        for l in self.doc_lengths:
            total += l
        self.avgdl = total / self.num_docs if self.num_docs > 0 else 0.0
        self.inverted = {}
        for doc_id, tokens in enumerate(corpus):
            tf: Dict[str, int] = {}
            for tok in tokens:
                tf[tok] = tf.get(tok, 0) + 1
            for term, count in tf.items():
                self.inverted.setdefault(term, []).append((doc_id, count))
        self.idf = {}
        n = self.num_docs
        for term, postings in self.inverted.items():
            df = len(postings)
            if self.method == "robertson":
                v = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            elif self.method == "lucene":
                v = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            elif self.method == "atire":
                v = math.log(n / df)
            else:
                v = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            self.idf[term] = v

    def get_scores(self, query: Sequence[str]) -> List[float]:
        scores = [0.0] * self.num_docs
        for token in query:
            idf = self.idf.get(token)
            if idf is None:
                continue
            for doc_id, tf in self.inverted[token]:
                dl = self.doc_lengths[doc_id]
                tf_norm = (tf * (self.k1 + 1)) / (
                    tf + self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl))
                )
                scores[doc_id] += idf * tf_norm
        return scores

    def retrieve(self, queries: Sequence[Sequence[str]], k: int):
        documents, scores_out = [], []
        for q in queries:
            scores = self.get_scores(q)
            # JS stable sort desc by score == sort by (-score, doc_id)
            order = sorted(range(len(scores)), key=lambda i: (-scores[i], i))
            top = order[:k]
            documents.append(top)
            scores_out.append([scores[i] for i in top])
        return documents, scores_out


class OracleScorer:
    """Reference BayesianBM25Scorer semantics on the oracle BM25."""

    def __init__(
        self,
        k1: float = 1.2,
        b: float = 0.75,
        method: str = "robertson",
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        base_rate=None,
        base_rate_method: str = "percentile",
    ):
        self.bm25 = OracleBM25(k1, b, method)
        self._user_alpha = alpha
        self._user_beta = beta
        self._user_base_rate = base_rate
        self._base_rate_method = base_rate_method
        self.alpha: float = 1.0
        self.beta: float = 0.0
        self.base_rate: Optional[float] = None
        self.corpus: List[List[str]] = []
        self.token_sets: List[set] = []

    def index(self, corpus: Sequence[Sequence[str]]) -> None:
        self.corpus = [list(d) for d in corpus]
        self.token_sets = [set(d) for d in corpus]
        self.bm25.index(corpus)
        per_query_scores = self._sample_pseudo_query_scores()
        self.alpha, self.beta = estimate_parameters(
            per_query_scores, self._user_alpha, self._user_beta
        )
        if self._user_base_rate == "auto":
            self.base_rate = estimate_base_rate(
                per_query_scores, len(corpus), self._base_rate_method
            )
        elif isinstance(self._user_base_rate, (int, float)) and not isinstance(
            self._user_base_rate, bool
        ):
            self.base_rate = float(self._user_base_rate)
        else:
            self.base_rate = None

    def _sample_pseudo_query_scores(self) -> List[np.ndarray]:
        n = len(self.corpus)
        sample = sample_without_replacement(n, min(n, 50), mulberry32(42))
        out = []
        for idx in sample:
            q = self.corpus[idx]
            if not q:
                continue
            scores = self.bm25.get_scores(q[:5])
            nz = [s for s in scores if s > 0]
            if nz:
                out.append(np.asarray(nz, dtype=np.float64))
        return out

    def _tf_overlap(self, doc_id: int, query: Sequence[str]) -> int:
        qset = set(query)
        return sum(1 for t in qset if t in self.token_sets[doc_id])

    def _probs_for(self, doc_ids, scores, query):
        probs = [0.0] * len(doc_ids)
        active = [(i, d, s) for i, (d, s) in enumerate(zip(doc_ids, scores)) if s > 0]
        if not active:
            return probs
        idxs = [a[0] for a in active]
        ids = [a[1] for a in active]
        sc = np.asarray([a[2] for a in active], dtype=np.float64)
        dlr = np.asarray(
            [self.bm25.doc_lengths[d] / self.bm25.avgdl for d in ids], dtype=np.float64
        )
        tfs = np.asarray([self._tf_overlap(d, query) for d in ids], dtype=np.float64)
        batch = score_to_probability(
            sc, tfs, dlr, self.alpha, self.beta, self.base_rate
        )
        for slot, p in zip(idxs, np.atleast_1d(batch)):
            probs[slot] = float(p)
        return probs

    def retrieve(self, queries: Sequence[Sequence[str]], k: int = 10):
        docs, scores = self.bm25.retrieve(queries, k)
        probabilities = [
            self._probs_for(docs[i], scores[i], queries[i]) for i in range(len(queries))
        ]
        return docs, scores, probabilities

    def get_probabilities(self, query: Sequence[str]) -> List[float]:
        scores = self.bm25.get_scores(query)
        doc_ids = list(range(len(scores)))
        return self._probs_for(doc_ids, scores, query)
