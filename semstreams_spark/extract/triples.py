"""Transcript-turn → semantic-triple extraction.

Re-expresses the reference's ``EntityPayload.Triples()`` contract
(``message/entity_payload.go:109-163``): each incoming record emits an
``rdf:type`` triple, then one triple per property, plus relationship
triples whose object is a 6-part entity ID
(``message/triple.go:118-147``). Here the "record" is a transcript turn
``(conv_id, turn_idx, role, text, tool, ts)``.

Emission rules (the engine's documented extraction contract):

  subject  = test.local.conv.<conv_id>.turn.<turn_idx>      (6 dot-parts)
  1. (subject, 'rdf:type',        'conv.turn',  'string')
  2. (subject, 'conv.turn.role',  role,         'string')
  3. (subject, 'conv.turn.text',  text,         'string')
  4. (subject, 'conv.turn.tool',  tool,         'string')     [tool != null]
  5. (subject, 'conv.turn.in',    test.local.graph.kb.conversation.<conv_id>,
                                              'entity_ref')
  6. (subject, 'conv.turn.mentions',
               test.local.graph.kb.entity.<name>, 'entity_ref')
     for each ``@entity:<name>`` token in text

All triples carry: source='transcript_extractor', ts=turn ts,
confidence=1.0 (``entity_payload.go:119-122``), context=conv_id
(correlation id, ``message/triple.go:67-71``), and an internal ``seq``
(= turn_idx) used as the deterministic LWW tie-break.

Two implementations with identical output:

- :func:`extract_triples` — pure Catalyst built-ins, single scan, one
  explode; whole-stage-codegen'd (the fast path used by bench).
- :func:`extract_triples_pandas_udf` — vectorized Arrow ``mapInPandas``
  (the north-star-mandated Arrow UDF path); used by the streaming
  pipeline and cross-checked against the built-in variant in tests.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MENTION_RE = "@entity:([a-z0-9_]+)"

TRIPLE_COLS = [
    "subject",
    "predicate",
    "object",
    "object_type",
    "source",
    "ts",
    "confidence",
    "context",
    "seq",
]

TRIPLE_SCHEMA = (
    "subject string, predicate string, object string, object_type string, "
    "source string, ts timestamp, confidence double, context string, seq int"
)

_SOURCE = "transcript_extractor"


def _turn_subject():
    return F.concat(
        F.lit("test.local.conv."),
        F.col("conv_id"),
        F.lit(".turn."),
        F.col("turn_idx").cast("string"),
    )


def extract_triples(transcripts: DataFrame) -> DataFrame:
    """Built-in-expression extraction: one scan, one explode, no Python.

    The per-row triple list is assembled as an array<struct> and exploded —
    Catalyst keeps the whole stage in codegen and the parquet scan reads
    only the six input columns once.
    """
    t3 = lambda pred, obj, otype: F.struct(  # noqa: E731
        pred.alias("predicate"), obj.alias("object"), otype.alias("object_type")
    )
    lit = F.lit

    base = F.array(
        t3(lit("rdf:type"), lit("conv.turn"), lit("string")),
        t3(lit("conv.turn.role"), F.col("role"), lit("string")),
        t3(lit("conv.turn.text"), F.col("text"), lit("string")),
        t3(
            lit("conv.turn.in"),
            F.concat(lit("test.local.graph.kb.conversation."), F.col("conv_id")),
            lit("entity_ref"),
        ),
    )
    tool_arr = F.when(
        F.col("tool").isNotNull(),
        F.array(t3(lit("conv.turn.tool"), F.col("tool"), lit("string"))),
    ).otherwise(F.array().cast("array<struct<predicate:string,object:string,object_type:string>>"))
    mention_arr = F.transform(
        F.regexp_extract_all(F.col("text"), F.lit(MENTION_RE), F.lit(1)),
        lambda m: t3(
            lit("conv.turn.mentions"),
            F.concat(lit("test.local.graph.kb.entity."), m),
            lit("entity_ref"),
        ),
    )

    return (
        transcripts.select(
            _turn_subject().alias("subject"),
            F.explode(F.concat(base, tool_arr, mention_arr)).alias("t"),
            F.col("ts"),
            F.col("conv_id").alias("context"),
            F.col("turn_idx").cast("int").alias("seq"),
        )
        .select(
            "subject",
            F.col("t.predicate").alias("predicate"),
            F.col("t.object").alias("object"),
            F.col("t.object_type").alias("object_type"),
            F.lit(_SOURCE).alias("source"),
            "ts",
            F.lit(1.0).alias("confidence"),
            "context",
            "seq",
        )
    )


_MENTION_CRE = re.compile(MENTION_RE)


def _extract_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized pandas extraction for one Arrow batch."""
    subj = "test.local.conv." + pdf["conv_id"] + ".turn." + pdf["turn_idx"].astype(str)
    n = len(pdf)

    frames = []

    def emit(mask, predicate, obj):
        frames.append(
            pd.DataFrame(
                {
                    "subject": subj[mask],
                    "predicate": predicate,
                    "object": obj[mask] if hasattr(obj, "__getitem__") and not isinstance(obj, str) else obj,
                    "object_type": "string",
                    "ts": pdf["ts"][mask],
                    "context": pdf["conv_id"][mask],
                    "seq": pdf["turn_idx"][mask],
                }
            )
        )

    all_mask = pd.Series(True, index=pdf.index)
    emit(all_mask, "rdf:type", "conv.turn")
    emit(all_mask, "conv.turn.role", pdf["role"])
    emit(all_mask, "conv.turn.text", pdf["text"])
    tool_mask = pdf["tool"].notna()
    if tool_mask.any():
        emit(tool_mask, "conv.turn.tool", pdf["tool"])
    conv_ref = pd.DataFrame(
        {
            "subject": subj,
            "predicate": "conv.turn.in",
            "object": "test.local.graph.kb.conversation." + pdf["conv_id"],
            "object_type": "entity_ref",
            "ts": pdf["ts"],
            "context": pdf["conv_id"],
            "seq": pdf["turn_idx"],
        }
    )
    frames.append(conv_ref)

    # mentions: str.findall then explode (vectorized C path in pandas)
    mentions = pdf["text"].str.findall(_MENTION_CRE)
    mcount = mentions.str.len()
    has_m = mcount > 0
    if has_m.any():
        idx = pdf.index[has_m].repeat(mcount[has_m])
        flat = [name for lst in mentions[has_m] for name in lst]
        mdf = pd.DataFrame(
            {
                "subject": subj.loc[idx].values,
                "predicate": "conv.turn.mentions",
                "object": ["test.local.graph.kb.entity." + x for x in flat],
                "object_type": "entity_ref",
                "ts": pdf["ts"].loc[idx].values,
                "context": pdf["conv_id"].loc[idx].values,
                "seq": pdf["turn_idx"].loc[idx].values,
            }
        )
        frames.append(mdf)

    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    if len(out) == 0:
        return pd.DataFrame(columns=TRIPLE_COLS)
    out["source"] = _SOURCE
    out["confidence"] = 1.0
    out["seq"] = out["seq"].astype("int32")
    _ = n
    return out[TRIPLE_COLS]


def extract_triples_pandas_udf(transcripts: DataFrame) -> DataFrame:
    """Arrow-batched mapInPandas extraction (north-star UDF path).

    Output is identical to :func:`extract_triples`; verified by
    ``tests/test_extract.py``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_pdf(pdf)

    return transcripts.mapInPandas(gen, schema=TRIPLE_SCHEMA)
