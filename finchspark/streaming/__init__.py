"""Streaming disposition (SURVEY.md §2.7).

The reference has NO event-time streaming operators: its "streaming" is a
one-pass bounded-memory implementation of a batch semantic (size-(k+1) heap,
`lib/src/sketch_schemes/mash.rs:23`). This engine is therefore batch with
checkpoint/resume (`finchspark.plans.checkpoint`), which is the north-rule's
resumability requirement.

Incremental ingest is nevertheless structurally supported: the signature
stage is per-row (no cross-row state), so a Structured Streaming deployment
is `spark.readStream` → `build_signatures` → `foreachBatch` append to the
signatures table, with candidate generation + clustering run as periodic
batch compactions over the growing table. A continuously-maintained
clustering (streaming CC) requires `applyInPandasWithState` over band keys
and is future work — documented, not shipped, because the reference defines
no semantics to match for it.
"""
