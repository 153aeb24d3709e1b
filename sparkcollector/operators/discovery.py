"""Discovery receiver semantics: rule match styles + config embed.

Reimplements the observed behavior of the discovery receiver
(reference: internal/receiver/discoveryreceiver/):

* :func:`match_predicate` — the three status-match styles a discovery
  rule may use (config.go:35,80-82): ``strict`` (exact string),
  ``regexp``, and ``expr`` (expression language).  Each compiles to a
  single Catalyst predicate — strict to ``=``, regexp to ``rlike``,
  expr through ``F.expr`` (the OTTL/expr-lang analog used elsewhere in
  this repo, route.py:55-66).
* :func:`embed_receiver_config` — ``embed_receiver_config: true``
  serializes the correlated receiver's config and attaches it
  base64-encoded as the ``discovery.receiver.config`` resource
  attribute (evaluator.go:131-148).  The reference marshals YAML; we
  embed canonical JSON (``to_json`` of the config struct) — same
  attribute contract (opaque base64 blob the frontend decodes), no
  Python in the path: ``base64(to_json(struct(...)))`` is pure
  Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RECEIVER_CONFIG_ATTR = "discovery.receiver.config"
OBSERVER_ID_ATTR = "discovery.observer.id"


def match_predicate(col: Column, style: str, pattern: str) -> Column:
    """One discovery status-match rule as a Catalyst predicate."""
    if style == "strict":
        return col == pattern
    if style == "regexp":
        return col.rlike(pattern)
    if style == "expr":
        # expression-language rule over the row (e.g. "value > 5 and
        # event_type = 'error'"); the pattern IS the expression.
        return F.expr(pattern)
    raise ValueError(f"unknown match style {style!r}; allowed: strict, regexp, expr")


def embed_receiver_config(
    df: DataFrame,
    rule_col: str,
    config_cols: list[str],
    observer_id: str | None = None,
) -> DataFrame:
    """Attach the base64-encoded serialized receiver config.

    Output adds ``discovery.receiver.config`` (base64 of the JSON
    config document: rule + config fields) and, when set,
    ``discovery.observer.id`` — mirroring correlateResourceAttributes.
    """
    doc = F.to_json(
        F.struct(
            F.col(rule_col).alias("rule"),
            F.struct(*[F.col(c) for c in config_cols]).alias("config"),
        )
    )
    # Spark's base64 is RFC-2045 MIME (76-char lines); the reference
    # uses StdEncoding (no wrapping) — strip the line breaks.
    b64 = F.regexp_replace(F.base64(doc.cast("binary")), "[\\r\\n]", "")
    out = df.withColumn(RECEIVER_CONFIG_ATTR, b64)
    if observer_id:
        out = out.withColumn(OBSERVER_ID_ATTR, F.lit(observer_id))
    return out
