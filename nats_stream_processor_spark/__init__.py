"""nats_stream_processor_spark — a PySpark-native analytics/streaming engine.

Re-implements the capabilities of the reference stream processor
(richardr1126/nats-stream-processor, a NATS JetStream sentiment/topic
enrichment service) as an idiomatic Spark engine:

- batch core: every operator is a pure DataFrame -> DataFrame transform
  (``operators/``), usable identically in batch and Structured Streaming;
- deterministic classifier stand-ins (``functions/``) with the exact output
  shape and gating semantics of the reference's ONNX models
  (reference: src/sentiment.py:124-174, src/topic_classifier.py:130-200),
  expressible in ANSI SQL for oracle checking;
- streaming wrapper (``streaming/``) with watermarked dedup, windows and
  rate metrics (reference: src/service.py:174-253, src/nats_client.py:99);
- NATS JetStream source/sink via the Python DataSource API (``sources/``,
  reference: src/nats_client.py:123-168, 220-286);
- LLM-data-pipeline operators: exact/minhash/simhash dedup, cosine top-k
  similarity search, text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"

# Populate the query registry HERE, at package level: Python executes this
# __init__ before any submodule, so whether an import chain starts at the
# driver ("from nats_stream_processor_spark import registry") or at a
# worker unpickling one query module's UDF helper, the full registration
# chain runs top-down first and no query module can ever observe a
# partially-initialized sibling (see registry._populate's note).
from . import registry as _registry  # noqa: E402

_registry._populate()
