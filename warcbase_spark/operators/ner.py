"""X16 — named-entity extraction (pluggable classifier).

Reference: NER3Classifier.scala:53-109 wraps a Stanford CRF classifier and
merges consecutive same-class tokens into entities (run-merging, committing
the buffer whenever the class changes); ExtractEntities.scala:62-65
initializes the classifier ONCE PER PARTITION inside mapPartitions — the
pattern this operator reproduces with ``mapInPandas`` (classifier factory
invoked once per partition iterator, Arrow-batched rows).

No CRF model ships in this container, so the default classifier is a
regex/gazetteer token classifier (exact-membership lookup) — honest,
deterministic, and DuckDB-mirrorable (the oracle reimplements run-merging
as a gaps-and-islands SQL query, an independent formulation of the same
semantics). A real model plugs in as ``classifier_factory`` (e.g. loading
spaCy/Stanza per partition) without touching the Spark plumbing.

Known reference bug, documented: classify()'s empty result literal is
malformed JSON (``{"PERSON":[],"ORGANIZATION"=[]...`` — '=' not ':';
NER3Classifier.scala:54). ``entities_to_json`` emits well-formed JSON.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

NER_TYPES = ("PERSON", "ORGANIZATION", "LOCATION")

# fallback gazetteer over the synthetic corpus vocabulary — the pluggable
# default, NOT a claim of real NER
DEFAULT_GAZETTEER: dict[str, set[str]] = {
    "PERSON": {"fast", "slow"},
    "ORGANIZATION": {"spark", "hash"},
    "LOCATION": {"table", "row"},
}


def gazetteer_classifier_factory(
    gazetteer: dict[str, set[str]] | None = None,
) -> Callable[[], Callable[[str], str]]:
    """Factory-of-factories: the OUTER call captures config on the driver;
    the INNER call runs once per partition (the reference's per-partition
    ``NER3Classifier.apply(file)`` init, ExtractEntities.scala:62-65)."""
    gaz = gazetteer or DEFAULT_GAZETTEER

    def init() -> Callable[[str], str]:
        lookup = {tok: cls for cls, toks in gaz.items() for tok in toks}
        return lambda tok: lookup.get(tok, "O")

    return init


SPACY_LABEL_MAP = {
    "PERSON": "PERSON",
    "ORG": "ORGANIZATION",
    "GPE": "LOCATION",
    "LOC": "LOCATION",
}


def spacy_classifier_factory(
    model: str = "en_core_web_sm",
) -> Callable[[], Callable[[list[str]], list[list[str]]]]:
    """Real-model upgrade path (lib-gated: spaCy ships no model in this
    container): the OUTER call validates availability on the driver; the
    INNER call loads the pipeline ONCE PER PARTITION — the exact
    ExtractEntities.scala:62-65 pattern with a genuinely expensive model
    object.

    DOCUMENT granularity, not token: the returned classifier takes a batch
    of normalized document texts and runs ``nlp.pipe(texts)`` ONCE for the
    whole batch, so the model sees full sentence context (and the pipeline
    cost is per-batch, not per-token). Entity char-spans are mapped back to
    whitespace-token class labels; spaCy labels map onto the reference's
    3-class set (PERSON/ORGANIZATION/LOCATION, NER3Classifier.scala:53).
    Pass this as ``extract_entities(doc_classifier_factory=...)``.
    """
    try:
        import spacy  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "spaCy is not available in this environment; use the gazetteer "
            "classifier (default) or install spacy + a model"
        ) from e

    def init() -> Callable[[list[str]], list[list[str]]]:
        import spacy

        nlp = spacy.load(model)  # once per partition — the expensive load

        def classify_batch(texts: list[str]) -> list[list[str]]:
            # ONE pipe invocation per Arrow batch — never per token/doc
            docs = list(nlp.pipe(texts))
            out: list[list[str]] = []
            for text, doc in zip(texts, docs):
                out.append(spans_to_token_classes(text, doc.ents, SPACY_LABEL_MAP))
            return out

        return classify_batch

    return init


def spans_to_token_classes(text: str, ents, label_map: dict[str, str]) -> list[str]:
    """Map entity char-spans (objects with .label_/.start_char/.end_char)
    onto the whitespace tokens of ``text``: a token gets the entity's class
    when their char ranges overlap. Pure function so the span→token logic
    is unit-testable without a model."""
    toks = text.split()
    offsets: list[tuple[int, int]] = []
    pos = 0
    for t in toks:
        start = text.index(t, pos)
        offsets.append((start, start + len(t)))
        pos = start + len(t)
    classes = ["O"] * len(toks)
    for ent in ents:
        cls = label_map.get(ent.label_)
        if cls is None:
            continue
        for i, (s, e) in enumerate(offsets):
            if s < ent.end_char and e > ent.start_char:
                classes[i] = cls
    return classes


def merge_entity_runs(tokens: list[str], classify: Callable[[str], str]) -> list[tuple[str, str]]:
    """Run-merging exactly as NER3Classifier.classify (scala:69-96): a
    buffer accumulates consecutive same-class tokens; the buffer commits
    when the class changes (and at end of input)."""
    return merge_runs(tokens, [classify(tok) for tok in tokens])


def merge_runs(tokens: list[str], classes: list[str]) -> list[tuple[str, str]]:
    """Run-merging over pre-computed per-token classes (shared by the
    token-level and document-level classifier protocols)."""
    out: list[tuple[str, str]] = []
    prev = "O"
    buf: list[str] = []
    for tok, cur in zip(tokens, classes):
        if cur != prev and prev != "O" and buf:
            out.append((prev, " ".join(buf)))
            buf = []
        prev = cur
        if cur != "O":
            buf.append(tok)
    if prev != "O" and buf:
        out.append((prev, " ".join(buf)))
    return out


_ENTITIES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("entity_type", T.StringType()),
        T.StructField("entity", T.StringType()),
    ]
)


def extract_entities(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    classifier_factory: Callable[[], Callable[[str], str]] | None = None,
    doc_classifier_factory: Callable[[], Callable[[list[str]], list[list[str]]]] | None = None,
) -> DataFrame:
    """(doc_id, entity_type, entity) rows — one per merged entity run.
    mapInPandas with per-partition classifier init; tokens are the same
    whitespace normalization as functions.text.

    Two classifier protocols: ``classifier_factory`` (token → class; the
    gazetteer default) and ``doc_classifier_factory`` (batch-of-texts →
    per-doc token classes in ONE model call per Arrow batch — the shape a
    real pipeline like spaCy needs for context and throughput)."""
    if doc_classifier_factory is not None:
        doc_init = doc_classifier_factory

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            classify_batch = doc_init()  # once per partition
            for pdf in it:
                dids: list[str] = []
                norms: list[str] = []
                for did, text in zip(pdf[id_col].astype(str), pdf[text_col]):
                    if text is None:
                        continue
                    dids.append(did)
                    # whitespace-normalize but keep CASE: real NER models
                    # (spaCy et al.) are trained on cased text — lowercasing
                    # here would strip the capitalization cues the model
                    # keys on (the gazetteer token path below lowercases
                    # because its dictionary is lowercase by construction)
                    norms.append(" ".join(str(text).split()))
                ids: list[str] = []
                types: list[str] = []
                ents: list[str] = []
                for did, norm, classes in zip(dids, norms, classify_batch(norms)):
                    for etype, ent in merge_runs(norm.split(), classes):
                        ids.append(did)
                        types.append(etype)
                        ents.append(ent)
                yield pd.DataFrame({"doc_id": ids, "entity_type": types, "entity": ents})

        return docs.select(id_col, text_col).mapInPandas(batches, _ENTITIES_SCHEMA)

    init = classifier_factory or gazetteer_classifier_factory()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        classify = init()  # once per partition — the expensive model load
        for pdf in it:
            ids: list[str] = []
            types: list[str] = []
            ents: list[str] = []
            for did, text in zip(pdf[id_col].astype(str), pdf[text_col]):
                if text is None:
                    continue
                toks = [t for t in str(text).lower().split() if t]
                for etype, ent in merge_entity_runs(toks, classify):
                    ids.append(did)
                    types.append(etype)
                    ents.append(ent)
            yield pd.DataFrame({"doc_id": ids, "entity_type": types, "entity": ents})

    return docs.select(id_col, text_col).mapInPandas(batches, _ENTITIES_SCHEMA)


def entities_to_json(text: str | None, classify: Callable[[str], str]) -> str:
    """Reference classify() output shape — per-doc JSON of entity lists by
    type (well-formed; see module docstring re: the reference's malformed
    empty literal)."""
    by_type: dict[str, list[str]] = {t: [] for t in NER_TYPES}
    if text is not None:
        toks = [t for t in text.lower().split() if t]
        for etype, ent in merge_entity_runs(toks, classify):
            by_type[etype].append(ent)
    return json.dumps(by_type)
