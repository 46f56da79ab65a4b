"""PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the *semantics* of the
opentelemetry-collector-contrib logs signal path (filelog receiver ->
stanza parsers/transformers -> processors -> routing connector ->
exporters + count/sum connectors), re-expressed as an idiomatic Spark
DataFrame pipeline: parse -> enrich -> route -> aggregate over tables of
multi-turn agent transcripts.

Design notes
------------
* Everything is declarative Column expressions so Catalyst gets full
  visibility (pushdown, pruning, codegen). Python appears only as
  Arrow-batched pandas UDFs in explicitly vectorized stages.
* The reference's error-channel contract (``on_error: send|drop``,
  pkg/stanza/operator/helper/transformer.go:105-132) is modeled as a
  ``parse_ok`` boolean column, never a thrown exception.
* Routing is first-match-wins (connector/routingconnector/logs.go:62-107)
  modeled as a single when-chain tag column computed once.
"""

__version__ = "0.1.0"
