"""docling_eval_ray — a Ray-Data-native document extraction / evaluation engine.

A from-scratch rebuild of the capabilities of the ``docling-eval`` reference
(single-process, row-at-a-time Python) as streaming ``ray.data.Dataset``
pipelines: ``map_batches`` over zero-copy Arrow batches, actor pools for
stateful stages, and groupby / sort / repartition for the wide steps.

Canonical data model (see ``datamodel.schema``): one row per document,
``spans: list<struct<kind, text, media_ref, offset>>`` — the Arrow
formalization of the reference's ``DoclingDocument.iterate_items()`` order
(reference: docling_eval/datamodels/dataset_record.py:21-73).

Layout:
  sources/    readers + deterministic interleaved-document synthesis
  stages/     map_batches / actor-pool transform stages (extraction, dedup,
              metrics, text analysis, ANN, media stubs)
  functions/  pure scalar/vectorized kernels (text, geometry, tables, graphs)
  pipelines/  end-to-end pipelines (flagship extraction, evaluate, relational)
  state/      lineage / checkpoint / resume
"""

__version__ = "0.1.0"


def _register_pickle_by_value() -> None:
    """Ship this package's code inside serialized tasks/actors.

    The engine is used from a repo checkout (not site-packages), so Ray
    worker processes may not have it on ``sys.path``. Registering the
    package for cloudpickle by-value serialization makes every
    ``map_batches`` fn / actor class self-contained — no ``runtime_env``
    or PYTHONPATH coordination needed, and it matches how the code would
    ship to a real multi-node cluster without a wheel.
    """
    try:
        import sys

        from ray import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover - ray not installed / vendored API moved
        pass


_register_pickle_by_value()
