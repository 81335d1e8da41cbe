"""Explanation / tracing facility for the Bayesian BM25 pipeline.

Port of the reference FusionDebugger (debug.ts:138-829): records every
intermediate — likelihood, priors, posterior, logits, fusion internals —
so a final probability is fully explainable, plus trace comparison and
text formatting.

Scorer-independent: works on raw (score, tf, doc_len_ratio, cosine)
values and a BayesianProbabilityTransform. In the Spark engine the same
values are emitted as extra columns by the scoring kernel when
explain=True; this module is the reference-shaped object API.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

from bayesian_bm25_js_spark.functions.fusion import (
    cosine_to_probability,
    prob_not,
)
from bayesian_bm25_js_spark.functions.kernel import (
    clamp_probability,
    logit,
    sigmoid,
)
from bayesian_bm25_js_spark.functions.transform import (
    BayesianProbabilityTransform,
)


@dataclass
class BM25SignalTrace:
    raw_score: float
    tf: float
    doc_len_ratio: float
    likelihood: float
    tf_prior: float
    norm_prior: float
    composite_prior: float
    logit_likelihood: float
    logit_prior: float
    logit_base_rate: Optional[float]
    posterior: float
    alpha: float
    beta: float
    base_rate: Optional[float]


@dataclass
class VectorSignalTrace:
    cosine_score: float
    probability: float
    logit_probability: float


@dataclass
class NotTrace:
    input_probability: float
    input_name: str
    complement: float
    logit_input: float
    logit_complement: float


@dataclass
class FusionTrace:
    signal_probabilities: List[float]
    signal_names: List[str]
    method: str
    logits: Optional[List[float]] = None
    mean_logit: Optional[float] = None
    alpha: Optional[float] = None
    n_alpha_scale: Optional[float] = None
    scaled_logit: Optional[float] = None
    weights: Optional[List[float]] = None
    fused_probability: float = 0.0
    log_probs: Optional[List[float]] = None
    log_prob_sum: Optional[float] = None
    complements: Optional[List[float]] = None
    log_complements: Optional[List[float]] = None
    log_complement_sum: Optional[float] = None


@dataclass
class DocumentTrace:
    doc_id: Union[str, int, None]
    signals: Dict[str, Union[BM25SignalTrace, VectorSignalTrace]]
    fusion: FusionTrace
    final_probability: float


@dataclass
class ComparisonResult:
    doc_a: DocumentTrace
    doc_b: DocumentTrace
    signal_deltas: Dict[str, float]
    dominant_signal: str
    crossover_stage: Optional[str]


class FusionDebugger:
    """Traces intermediate values through the fusion pipeline
    (debug.ts:138-603)."""

    def __init__(self, transform: BayesianProbabilityTransform) -> None:
        self._transform = transform

    def trace_bm25(
        self, score: float, tf: float, doc_len_ratio: float, doc_id=None
    ) -> BM25SignalTrace:
        t = self._transform
        likelihood_val = float(t.likelihood(score))
        tf_prior_val = float(BayesianProbabilityTransform.tf_prior(tf))
        norm_prior_val = float(BayesianProbabilityTransform.norm_prior(doc_len_ratio))
        composite_prior_val = float(
            BayesianProbabilityTransform.composite_prior(tf, doc_len_ratio)
        )
        posterior_val = float(
            BayesianProbabilityTransform.posterior(
                likelihood_val, composite_prior_val, t.base_rate
            )
        )
        return BM25SignalTrace(
            raw_score=score,
            tf=tf,
            doc_len_ratio=doc_len_ratio,
            likelihood=likelihood_val,
            tf_prior=tf_prior_val,
            norm_prior=norm_prior_val,
            composite_prior=composite_prior_val,
            logit_likelihood=float(logit(likelihood_val)),
            logit_prior=float(logit(composite_prior_val)),
            logit_base_rate=(
                float(logit(t.base_rate)) if t.base_rate is not None else None
            ),
            posterior=posterior_val,
            alpha=t.alpha,
            beta=t.beta,
            base_rate=t.base_rate,
        )

    def trace_vector(self, cosine_score: float, doc_id=None) -> VectorSignalTrace:
        prob_val = float(cosine_to_probability(cosine_score))
        return VectorSignalTrace(
            cosine_score=cosine_score,
            probability=prob_val,
            logit_probability=float(logit(prob_val)),
        )

    def trace_not(self, probability: float, name: str = "signal") -> NotTrace:
        complement = float(prob_not(probability))
        return NotTrace(
            input_probability=probability,
            input_name=name,
            complement=complement,
            logit_input=float(logit(probability)),
            logit_complement=float(logit(complement)),
        )

    def trace_fusion(
        self,
        probabilities: List[float],
        names: Optional[List[str]] = None,
        method: str = "log_odds",
        alpha: Optional[float] = None,
        weights: Optional[List[float]] = None,
    ) -> FusionTrace:
        probs = list(map(float, probabilities))
        n = len(probs)
        signal_names = names if names is not None else [f"signal_{i}" for i in range(n)]
        if method == "log_odds":
            return self._trace_log_odds(probs, signal_names, alpha, weights)
        if method == "prob_and":
            return self._trace_prob_and(probs, signal_names)
        if method == "prob_or":
            return self._trace_prob_or(probs, signal_names)
        if method == "prob_not":
            return self._trace_prob_not(probs, signal_names)
        raise ValueError(
            "method must be 'log_odds', 'prob_and', 'prob_or', or 'prob_not', "
            f"got '{method}'"
        )

    def _trace_log_odds(self, probs, names, alpha, weights) -> FusionTrace:
        n = len(probs)
        clamped = [float(clamp_probability(p)) for p in probs]
        logits_arr = [float(logit(p)) for p in clamped]
        if weights is not None:
            effective_alpha = alpha if alpha is not None else 0.0
            n_alpha_scale = n**effective_alpha
            weighted_logit = 0.0
            for i in range(n):
                weighted_logit += weights[i] * logits_arr[i]
            scaled = n_alpha_scale * weighted_logit
            return FusionTrace(
                signal_probabilities=clamped,
                signal_names=names,
                method="log_odds",
                logits=logits_arr,
                mean_logit=weighted_logit,
                alpha=effective_alpha,
                n_alpha_scale=n_alpha_scale,
                scaled_logit=scaled,
                weights=list(weights),
                fused_probability=float(sigmoid(scaled)),
            )
        effective_alpha = alpha if alpha is not None else 0.5
        logit_sum = 0.0
        for l in logits_arr:
            logit_sum += l
        mean_logit = logit_sum / n
        n_alpha_scale = n**effective_alpha
        scaled = mean_logit * n_alpha_scale
        return FusionTrace(
            signal_probabilities=clamped,
            signal_names=names,
            method="log_odds",
            logits=logits_arr,
            mean_logit=mean_logit,
            alpha=effective_alpha,
            n_alpha_scale=n_alpha_scale,
            scaled_logit=scaled,
            fused_probability=float(sigmoid(scaled)),
        )

    def _trace_prob_and(self, probs, names) -> FusionTrace:
        clamped = [float(clamp_probability(p)) for p in probs]
        log_probs = [math.log(p) for p in clamped]
        log_sum = 0.0
        for lp in log_probs:
            log_sum += lp
        return FusionTrace(
            signal_probabilities=clamped,
            signal_names=names,
            method="prob_and",
            fused_probability=math.exp(log_sum),
            log_probs=log_probs,
            log_prob_sum=log_sum,
        )

    def _trace_prob_or(self, probs, names) -> FusionTrace:
        clamped = [float(clamp_probability(p)) for p in probs]
        comps = [1.0 - p for p in clamped]
        log_comps = [math.log(c) for c in comps]
        log_sum = 0.0
        for lc in log_comps:
            log_sum += lc
        return FusionTrace(
            signal_probabilities=clamped,
            signal_names=names,
            method="prob_or",
            fused_probability=1.0 - math.exp(log_sum),
            complements=comps,
            log_complements=log_comps,
            log_complement_sum=log_sum,
        )

    def _trace_prob_not(self, probs, names) -> FusionTrace:
        clamped = [float(clamp_probability(p)) for p in probs]
        comps = [1.0 - p for p in clamped]
        log_comps = [math.log(c) for c in comps]
        log_sum = 0.0
        for lc in log_comps:
            log_sum += lc
        return FusionTrace(
            signal_probabilities=clamped,
            signal_names=names,
            method="prob_not",
            fused_probability=math.exp(log_sum),
            complements=comps,
            log_complements=log_comps,
            log_complement_sum=log_sum,
        )

    def trace_document(
        self,
        bm25_score: Optional[float] = None,
        tf: Optional[float] = None,
        doc_len_ratio: Optional[float] = None,
        cosine_score: Optional[float] = None,
        method: str = "log_odds",
        alpha: Optional[float] = None,
        weights: Optional[List[float]] = None,
        doc_id=None,
    ) -> DocumentTrace:
        signals: Dict[str, Union[BM25SignalTrace, VectorSignalTrace]] = {}
        probs: List[float] = []
        names: List[str] = []

        if bm25_score is not None:
            if tf is None or doc_len_ratio is None:
                raise ValueError(
                    "tf and doc_len_ratio are required when bm25_score is provided"
                )
            bm25_trace = self.trace_bm25(bm25_score, tf, doc_len_ratio, doc_id)
            signals["BM25"] = bm25_trace
            probs.append(bm25_trace.posterior)
            names.append("BM25")

        if cosine_score is not None:
            vec_trace = self.trace_vector(cosine_score, doc_id)
            signals["Vector"] = vec_trace
            probs.append(vec_trace.probability)
            names.append("Vector")

        if not probs:
            raise ValueError(
                "At least one of bm25_score or cosine_score must be provided"
            )

        fusion_trace = self.trace_fusion(
            probs, names=names, method=method, alpha=alpha, weights=weights
        )
        return DocumentTrace(
            doc_id=doc_id,
            signals=signals,
            fusion=fusion_trace,
            final_probability=fusion_trace.fused_probability,
        )

    @staticmethod
    def _signal_probability(trace: DocumentTrace, name: str) -> float:
        sig = trace.signals.get(name)
        if sig is None:
            return 0.5
        if isinstance(sig, BM25SignalTrace):
            return sig.posterior
        if isinstance(sig, VectorSignalTrace):
            return sig.probability
        return 0.5

    def compare(
        self, trace_a: DocumentTrace, trace_b: DocumentTrace
    ) -> ComparisonResult:
        all_names: List[str] = []
        seen = set()
        for name in list(trace_a.signals) + list(trace_b.signals):
            if name not in seen:
                all_names.append(name)
                seen.add(name)

        signal_deltas = {
            name: self._signal_probability(trace_a, name)
            - self._signal_probability(trace_b, name)
            for name in all_names
        }

        dominant = all_names[0]
        max_abs = 0.0
        for name in all_names:
            if abs(signal_deltas[name]) > max_abs:
                max_abs = abs(signal_deltas[name])
                dominant = name

        fused_delta = trace_a.final_probability - trace_b.final_probability
        crossover_stage = None
        for name in all_names:
            if name == dominant:
                continue
            delta = signal_deltas[name]
            if fused_delta != 0.0 and delta != 0.0 and (fused_delta > 0) != (delta > 0):
                crossover_stage = name
                break

        return ComparisonResult(
            doc_a=trace_a,
            doc_b=trace_b,
            signal_deltas=signal_deltas,
            dominant_signal=dominant,
            crossover_stage=crossover_stage,
        )

    # -- formatting (debug.ts:610-829) --------------------------------------
    def format_trace(self, trace: DocumentTrace, verbose: bool = True) -> str:
        lines: List[str] = []
        doc_label = str(trace.doc_id) if trace.doc_id is not None else "unknown"
        lines.append(f"Document: {doc_label}")
        for name, sig in trace.signals.items():
            if isinstance(sig, BM25SignalTrace):
                lines.append(
                    f"  [{name}] raw={sig.raw_score:.2f}"
                    f" -> likelihood={sig.likelihood:.3f}"
                    f" (alpha={sig.alpha:.2f}, beta={sig.beta:.2f})"
                )
                lines.append(f"         tf={sig.tf:.0f} -> tf_prior={sig.tf_prior:.3f}")
                lines.append(
                    f"         dl_ratio={sig.doc_len_ratio:.2f}"
                    f" -> norm_prior={sig.norm_prior:.3f}"
                )
                lines.append(f"         composite_prior={sig.composite_prior:.3f}")
                if sig.base_rate is not None:
                    posterior_no_br = float(
                        BayesianProbabilityTransform.posterior(
                            sig.likelihood, sig.composite_prior, None
                        )
                    )
                    lines.append(f"         posterior={posterior_no_br:.3f}")
                    lines.append(
                        f"         with base_rate={sig.base_rate:.3f}:"
                        f" posterior={sig.posterior:.3f}"
                    )
                else:
                    lines.append(f"         posterior={sig.posterior:.3f}")
                if verbose:
                    lines.append(
                        f"         logit(posterior)={float(logit(sig.posterior)):.3f}"
                    )
                lines.append("")
            elif isinstance(sig, VectorSignalTrace):
                lines.append(
                    f"  [{name}] cosine={sig.cosine_score:.3f}"
                    f" -> prob={sig.probability:.3f}"
                )
                if verbose:
                    lines.append(f"           logit(prob)={sig.logit_probability:.3f}")
                lines.append("")

        f = trace.fusion
        alpha_str = f", alpha={f.alpha}" if f.alpha is not None else ""
        lines.append(
            f"  [Fusion] method={f.method}{alpha_str}, n={len(f.signal_probabilities)}"
        )
        if verbose:
            if f.logits is not None:
                lines.append(
                    "           logits=[" + ", ".join(f"{v:.3f}" for v in f.logits) + "]"
                )
            if f.mean_logit is not None:
                lines.append(f"           mean_logit={f.mean_logit:.3f}")
            if f.n_alpha_scale is not None:
                lines.append(
                    f"           n^alpha={f.n_alpha_scale:.3f}, scaled={f.scaled_logit:.3f}"
                )
            if f.weights is not None:
                lines.append(
                    "           weights=[" + ", ".join(f"{w:.3f}" for w in f.weights) + "]"
                )
            if f.log_probs is not None:
                lines.append(
                    "           ln(P)=[" + ", ".join(f"{v:.3f}" for v in f.log_probs) + "]"
                )
                lines.append(f"           sum(ln(P))={f.log_prob_sum:.3f}")
            if f.complements is not None:
                lines.append(
                    "           1-P=[" + ", ".join(f"{v:.3f}" for v in f.complements) + "]"
                )
            if f.log_complements is not None:
                lines.append(
                    "           ln(1-P)=["
                    + ", ".join(f"{v:.3f}" for v in f.log_complements)
                    + "]"
                )
                lines.append(f"           sum(ln(1-P))={f.log_complement_sum:.3f}")
        lines.append(f"           -> final={f.fused_probability:.3f}")
        return "\n".join(lines)

    def format_not(self, trace: NotTrace) -> str:
        """Human-readable NOT trace (debug.ts:229-240)."""
        p, c = trace.input_probability, trace.complement
        name = trace.input_name
        li, lc = trace.logit_input, trace.logit_complement
        return "\n".join(
            [
                f"  [NOT {name}]",
                f"    P({name}) = {p:.3f}",
                f"    P(NOT {name}) = 1 - {p:.3f} = {c:.3f}",
                f"    logit({p:.3f}) = {'+' if li >= 0 else ''}{li:.3f}",
                f"    logit({c:.3f}) = {'+' if lc >= 0 else ''}{lc:.3f}"
                "  (sign flipped)",
            ]
        )

    def format_comparison(self, comparison: ComparisonResult) -> str:
        """Side-by-side comparison table (debug.ts:753-829): per-signal
        probabilities and deltas, the fused row, rank order, dominant
        signal, and the crossover note when a signal disagreed with the
        final ordering."""
        a, b = comparison.doc_a, comparison.doc_b
        a_label = str(a.doc_id) if a.doc_id is not None else "doc_a"
        b_label = str(b.doc_id) if b.doc_id is not None else "doc_b"
        lines = [f"Comparison: {a_label} vs {b_label}"]
        lines.append(
            f"  {'Signal':<12} {a_label:>8}  {b_label:>8}"
            f"  {'delta':>8}   dominant"
        )
        for name, delta in comparison.signal_deltas.items():
            prob_a = self._signal_probability(a, name)
            prob_b = self._signal_probability(b, name)
            marker = (
                "   <-- largest" if name == comparison.dominant_signal else ""
            )
            delta_str = ("+" if delta >= 0 else "") + f"{delta:.3f}"
            lines.append(
                f"  {name:<12} {prob_a:>8.3f}  {prob_b:>8.3f}"
                f"  {delta_str:>8}{marker}"
            )
        fused_delta = a.final_probability - b.final_probability
        fused_str = ("+" if fused_delta >= 0 else "") + f"{fused_delta:.3f}"
        lines.append(
            f"  {'Fused':<12} {a.final_probability:>8.3f}"
            f"  {b.final_probability:>8.3f}  {fused_str:>8}"
        )
        lines.append("")
        if fused_delta > 0:
            lines.append(
                f"  Rank order: {a_label} > {b_label} (by +{fused_delta:.3f})"
            )
        elif fused_delta < 0:
            lines.append(
                f"  Rank order: {b_label} > {a_label} (by +{abs(fused_delta):.3f})"
            )
        else:
            lines.append("  Rank order: tied")
        dom = comparison.dominant_signal
        dom_delta = comparison.signal_deltas[dom]
        favored = a_label if dom_delta >= 0 else b_label
        dom_str = ("+" if dom_delta >= 0 else "") + f"{dom_delta:.3f}"
        lines.append(
            f"  Dominant signal: {dom} ({dom_str} in {favored}'s favor)"
        )
        if comparison.crossover_stage is not None:
            cross = comparison.crossover_stage
            cross_delta = comparison.signal_deltas[cross]
            cross_favored = a_label if cross_delta >= 0 else b_label
            lines.append(
                f"  Note: {cross} favored {cross_favored},"
                f" but {dom} signal outweighed it"
            )
        return "\n".join(lines)

    def format_summary(self, trace: DocumentTrace) -> str:
        doc_label = str(trace.doc_id) if trace.doc_id is not None else "unknown"
        parts = []
        for sig in trace.signals.values():
            if isinstance(sig, BM25SignalTrace):
                parts.append(f"BM25={sig.posterior:.3f}")
            elif isinstance(sig, VectorSignalTrace):
                parts.append(f"Vec={sig.probability:.3f}")
        f = trace.fusion
        alpha_str = f", alpha={f.alpha}" if f.alpha is not None else ""
        return (
            f"{doc_label}: {' '.join(parts)}"
            f" -> Fused={f.fused_probability:.3f} ({f.method}{alpha_str})"
        )
