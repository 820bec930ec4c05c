"""Deterministic extraction ontology (gazetteer + relation rules).

The reference's core transform is a frontier-LLM structured-output call
(reference ``src/local_graph_extraction/extract.py:48-60``) guided by a
prompt whose ontology is fixed: node types ``concept|intervention``
(``core.py:8``), edge-verb families (``src/prompt/final_primary_prompt.py:59-66``),
concept categories (``final_primary_prompt.py:106-127``), intervention
lifecycle 1-6 and maturity 1-4 (``core.py:11-12``).

In-sandbox the "model" must be deterministic so P/R >= 0.95 is scored
against a computable golden set (SURVEY.md §7.4).  This module *is* the
model's knowledge: a gazetteer of entities (with aliases, mirroring the
alias machinery at ``core.py:7`` / ``prompts.py:94``) and pattern rules
``subj --pred--> obj`` with trigger phrases.  The corpus generator
(``fixtures.py``) plants facts using these same templates, and the
``TripleExtractor`` stage re-detects them with compiled regexes — the
same actor-pool architecture an LLM-backed extractor would use.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Entity:
    name: str
    aliases: tuple[str, ...]
    type: str  # "concept" | "intervention"
    description: str
    concept_category: str | None = None
    intervention_lifecycle: int | None = None  # 1-6
    intervention_maturity: int | None = None   # 1-4

    @property
    def surfaces(self) -> tuple[str, ...]:
        return (self.name,) + self.aliases


@dataclass(frozen=True)
class Rule:
    chain: str   # chain title this rule belongs to
    subj: str    # entity name
    pred: str    # edge verb (open vocabulary, prompt families)
    obj: str     # entity name
    confidence: int  # 1-5

    @property
    def description(self) -> str:
        return f"{self.subj} {self.pred.replace('_', ' ')} {self.obj}"


# Trigger phrase per predicate: the surface text a planted fact uses and
# the extractor detects.  Edge verbs are the prompt's Step-5 families
# (final_primary_prompt.py:59-66); they stay free-form strings downstream
# (core.py:17 — open vocabulary).
TRIGGERS: dict[str, str] = {
    "leads_to": "leads to",
    "causes": "causes",
    "contributes_to": "contributes to",
    "enables": "enables",
    "requires": "requires",
    "depends_on": "depends on",
    "builds_upon": "builds upon",
    "refined_by": "is refined by",
    "addressed_by": "is addressed by",
    "mitigated_by": "is mitigated by",
    "implemented_by": "is implemented by",
    "correlates_with": "correlates with",
}


def _c(name, aliases, desc, cat):
    return Entity(name, tuple(aliases), "concept", desc, concept_category=cat)


def _i(name, aliases, desc, lifecycle, maturity):
    return Entity(name, tuple(aliases), "intervention", desc,
                  intervention_lifecycle=lifecycle, intervention_maturity=maturity)


# ~30 entities.  "rlhf", "alignment", "deception" are the designated head
# entities (SURVEY.md §4.2 skew note): the corpus generator over-samples
# them so node-dedup group-bys see hot keys.
ENTITIES: tuple[Entity, ...] = (
    _c("emergent deception in large language models",
       ("llm deception", "deceptive behaviour in llms"),
       "State-of-the-art LLMs can intentionally induce false beliefs in evaluation tasks.",
       "Finding"),
    _c("alignment", ("ai alignment", "value alignment"),
       "The problem of making AI systems pursue intended goals.", "Problem"),
    _c("deception", ("strategic deception", "model deception"),
       "A model's capacity to induce false beliefs in overseers.", "Risk"),
    _c("monitoring evasion", ("alignment bypass risk", "oversight evasion"),
       "Deceptive models may hide unsafe objectives from evaluators.", "Threat"),
    _c("power seeking at scale", ("powerseeking appearing at scale", "emergent power seeking"),
       "Larger models show instrumental resource-acquisition tendencies.", "Observation"),
    _c("reward hacking", ("specification gaming", "reward gaming"),
       "Agents exploit misspecified reward functions.", "Finding"),
    _c("goal misgeneralization", ("objective misgeneralization", "inner misalignment"),
       "Learned goals differ from training objectives out of distribution.", "Problem"),
    _c("scale deception correlation", ("size deception correlation", "scaling increases deceit"),
       "Only larger models exhibit reliable first-order deception.", "Observation"),
    _c("chain of thought amplification", ("cot boosts deception", "step-by-step reasoning increases deceit"),
       "Chain-of-thought prompting raises second-order deception success.", "Finding"),
    _c("adversarial exploitation of gradients", ("gradient leakage", "gradient information exploitation"),
       "Gradient information enables adversarial input construction.", "Finding"),
    _c("input perturbation vulnerability", ("adversarial example susceptibility", "perturbation fragility"),
       "Models are vulnerable to small crafted input perturbations.", "Risk"),
    _c("sycophancy", ("model sycophancy", "agreement bias"),
       "Models mirror user beliefs over truthful answers.", "Finding"),
    _c("situational awareness", ("self-awareness in models", "evaluation awareness"),
       "Models recognise when they are being evaluated.", "Risk"),
    _c("distributional shift", ("distribution shift", "covariate shift"),
       "Deployment inputs differ from the training distribution.", "Assumption"),
    _c("interpretability gap", ("opacity of model internals", "mechanistic opacity"),
       "Model internals are not human-legible by default.", "Problem"),
    _c("capability overhang", ("latent capabilities", "hidden capability reserve"),
       "Capabilities exceed what standard evaluations elicit.", "Threat"),
    _i("rlhf", ("reinforcement learning from human feedback", "preference-based fine-tuning"),
       "Align model behaviour through preference modelling and reinforcement learning.",
       3, 4),
    _i("constitutional training with harm taxonomies",
       ("constitutional ai during rlhf", "principle-guided preference training"),
       "Apply constitutional AI with explicit harm taxonomies during RLHF.", 3, 3),
    _i("standardized deception evaluation suite",
       ("deception benchmark before release", "pre-deployment deception audit"),
       "Run structured deception tasks before deployment.", 4, 2),
    _i("chain of thought output restriction",
       ("cot output suppression", "hidden reasoning traces"),
       "Withhold raw multi-step reasoning traces from end users.", 5, 2),
    _i("machiavellian prompt filtering",
       ("deception-trigger moderation", "manipulative prompt detection"),
       "Detect and neutralise prompts that prime manipulative reasoning.", 5, 2),
    _i("anti-deception fine-tuning",
       ("honesty fine-tuning", "truthfulness objective training"),
       "Fine-tune with objectives and data that penalise deceptive outputs.", 2, 1),
    _i("gradient masking with noise injection",
       ("noise-injected training", "gradient obfuscation sigma 0.1"),
       "Inject noise into gradients during training to blunt adversarial exploitation.", 1, 2),
    _i("red team evaluation with diverse prompts",
       ("structured red teaming", "adversarial evaluation battery"),
       "Require 100+ diverse red-team prompts before deployment.", 4, 3),
    _i("runtime anomaly monitoring",
       ("deployment-time behaviour monitoring", "production anomaly detection"),
       "Monitor deployed models for behavioural anomalies.", 5, 3),
    _i("sparse autoencoder probing",
       ("sae feature probing", "dictionary-learning interpretability"),
       "Probe internal features with sparse autoencoders to audit representations.", 4, 1),
    _i("scalable oversight protocols",
       ("debate-based oversight", "recursive reward modelling"),
       "Use AI-assisted oversight to supervise superhuman tasks.", 6, 1),
    _i("capability elicitation evaluations",
       ("elicitation stress-testing", "fine-tuning-based capability probes"),
       "Elicit latent capabilities with targeted fine-tuning before release.", 4, 2),
)

HEAD_ENTITIES: tuple[str, ...] = ("rlhf", "alignment", "deception")

# ~30 rules grouped into 8 logical chains (mirrors the golden sample's
# 9-node / 4-chain / 8-edge shape, src/prompt/schemas/output_sample.json).
ENTITY_BY_NAME: dict[str, Entity] = {e.name: e for e in ENTITIES}

RULES: tuple[Rule, ...] = (
    # chain 1: deception finding -> risk -> pre-deployment audit
    Rule("deception risk and pre-deployment auditing",
         "emergent deception in large language models", "leads_to", "monitoring evasion", 4),
    Rule("deception risk and pre-deployment auditing",
         "monitoring evasion", "mitigated_by", "standardized deception evaluation suite", 3),
    Rule("deception risk and pre-deployment auditing",
         "scale deception correlation", "contributes_to", "deception", 4),
    Rule("deception risk and pre-deployment auditing",
         "deception", "addressed_by", "anti-deception fine-tuning", 2),
    # chain 2: CoT amplification -> output restriction
    Rule("chain-of-thought deception amplification",
         "chain of thought amplification", "enables", "deception", 5),
    Rule("chain-of-thought deception amplification",
         "deception", "mitigated_by", "chain of thought output restriction", 2),
    Rule("chain-of-thought deception amplification",
         "machiavellian prompt filtering", "builds_upon", "chain of thought output restriction", 1),
    # chain 3: reward hacking -> misalignment -> RLHF refinement
    Rule("reward hacking and alignment training",
         "reward hacking", "contributes_to", "goal misgeneralization", 4),
    Rule("reward hacking and alignment training",
         "goal misgeneralization", "leads_to", "alignment", 3),
    Rule("reward hacking and alignment training",
         "alignment", "addressed_by", "rlhf", 4),
    Rule("reward hacking and alignment training",
         "rlhf", "refined_by", "constitutional training with harm taxonomies", 3),
    Rule("reward hacking and alignment training",
         "constitutional training with harm taxonomies", "requires", "rlhf", 5),
    # chain 4: adversarial robustness
    Rule("adversarial robustness interventions",
         "adversarial exploitation of gradients", "leads_to", "input perturbation vulnerability", 5),
    Rule("adversarial robustness interventions",
         "input perturbation vulnerability", "mitigated_by", "gradient masking with noise injection", 3),
    Rule("adversarial robustness interventions",
         "input perturbation vulnerability", "addressed_by", "red team evaluation with diverse prompts", 4),
    # chain 5: sycophancy / situational awareness
    Rule("evaluation-aware behaviour",
         "sycophancy", "correlates_with", "situational awareness", 3),
    Rule("evaluation-aware behaviour",
         "situational awareness", "enables", "monitoring evasion", 4),
    Rule("evaluation-aware behaviour",
         "situational awareness", "addressed_by", "capability elicitation evaluations", 2),
    Rule("evaluation-aware behaviour",
         "deception", "correlates_with", "situational awareness", 3),
    # chain 6: distribution shift -> monitoring
    Rule("deployment monitoring for shifted inputs",
         "distributional shift", "causes", "goal misgeneralization", 4),
    Rule("deployment monitoring for shifted inputs",
         "distributional shift", "addressed_by", "runtime anomaly monitoring", 3),
    Rule("deployment monitoring for shifted inputs",
         "runtime anomaly monitoring", "depends_on", "standardized deception evaluation suite", 2),
    # chain 7: interpretability
    Rule("interpretability as an audit path",
         "interpretability gap", "mitigated_by", "sparse autoencoder probing", 2),
    Rule("interpretability as an audit path",
         "sparse autoencoder probing", "enables", "runtime anomaly monitoring", 2),
    Rule("interpretability as an audit path",
         "interpretability gap", "contributes_to", "monitoring evasion", 3),
    # chain 8: oversight & capability elicitation
    Rule("scalable oversight of latent capabilities",
         "capability overhang", "leads_to", "power seeking at scale", 2),
    Rule("scalable oversight of latent capabilities",
         "power seeking at scale", "mitigated_by", "scalable oversight protocols", 1),
    Rule("scalable oversight of latent capabilities",
         "capability overhang", "addressed_by", "capability elicitation evaluations", 3),
    Rule("scalable oversight of latent capabilities",
         "scalable oversight protocols", "implemented_by", "rlhf", 2),
    Rule("scalable oversight of latent capabilities",
         "alignment", "requires", "scalable oversight protocols", 3),
)

CHAIN_TITLES: tuple[str, ...] = tuple(dict.fromkeys(r.chain for r in RULES))

# Rules that mention a head entity — the generator over-samples these.
HEAD_RULES: tuple[int, ...] = tuple(
    i for i, r in enumerate(RULES)
    if r.subj in HEAD_ENTITIES or r.obj in HEAD_ENTITIES
)

for _r in RULES:  # integrity check at import time
    assert _r.subj in ENTITY_BY_NAME and _r.obj in ENTITY_BY_NAME, _r
    assert _r.pred in TRIGGERS, _r
    assert 1 <= _r.confidence <= 5, _r
