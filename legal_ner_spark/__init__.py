"""legal_ner_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of Legal-NLP-EkStep/legal_NER.

NOT a port: the reference is a single-process spaCy pipeline
(/root/reference/legal_ner.py, postprocessing_utils.py, data_preparation.py);
this engine re-expresses its operator semantics (SURVEY.md §2) as Spark
DataFrame plans plus two Arrow-vectorized pandas stages, designed for a
multi-executor cluster over an Iceberg corpus of interleaved text+media docs.

Layout
------
core/        pure-Python per-document semantics (tokenizer, spans, the faithful
             reimplementation of the reference's postprocessing DAG, the
             deterministic sandbox tagger). Used inside Arrow UDF batches AND
             directly in unit tests as the single-doc oracle.
operators/   DataFrame-native operator library: the fused extract stage,
             relational forms of the reference's joins/windows, plus the
             training-data-pipeline ops (dedup, similarity, text stats,
             multimodal plumbing).
functions/   Catalyst column-expression builders (pure F.* — no Python UDFs).
plans/       lineage ledger + checkpointed resume.
streaming/   Structured Streaming wrapper reusing the batch operators.
pipeline.py  end-to-end KG construction entry points.
synth.py     deterministic synthetic corpus generator (BASELINE.json input_hint
             shape); distributed via mapInPandas, seeded per doc_id.
"""

__version__ = "0.1.0"
