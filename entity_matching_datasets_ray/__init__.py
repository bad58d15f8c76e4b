"""entity_matching_datasets_ray — a Ray-Data-native record-linkage engine.

A from-scratch rebuild of the data-processing capabilities of the
``SafiullahOmar/entity_matching_datasets`` reference toolkit (Magellan /
DeepMatcher / WDC entity-matching corpus preparation + LLM normalization),
re-expressed as idiomatic Ray Data pipelines:

- input is a Lance-style table of interleaved text+media documents
  (``doc_id: string``, ``spans: list<struct<kind,text,media_ref,offset>>``);
- deterministic Arrow-batch normalization kernels replace the reference's
  prompt-delegated LLM normalization (see ``functions.normalizers``);
- multi-pass blocking (sorted-neighborhood + MinHash-LSH) is realized as
  sort / groupby shuffles with explicit hot-key salting (``stages.blocking``);
- candidate pairs are scored in a stateful actor pool computing
  Jaro-Winkler / Levenshtein / token-Jaccard / TF-IDF-cosine features with a
  calibrated logistic matcher (``stages.scoring``);
- matched edges resolve into entity clusters via hash-partitioned iterative
  connected components with deterministic canonical-id election
  (``stages.clustering``).

None of the code here calls ``ray.init`` / ``ray.shutdown``: sessions are
owned by the driver, ``bench.py``, or the test fixture.
"""

__version__ = "0.1.0"
