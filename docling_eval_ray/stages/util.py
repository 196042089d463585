"""Stage-execution helpers.

``stage(ds, Cls, ...)`` runs a callable-class batch transform either as
an **actor pool** (``concurrency=N``: state built once per actor — use
for heavy state: models, big broadcast indexes) or as **stateless tasks**
(``concurrency=None``: the instance is built once per task invocation and
amortized over that batch — use for cheap state: compiled regexes, small
dicts).

Why the distinction matters operationally: actor pools RESERVE their
CPUs for the lifetime of the stage. Several pools stacked in one
pipeline can reserve every CPU and starve the stateless read/shuffle
tasks — the streaming executor then deadlocks silently (observed
locally: two 2-actor pools on a 4-CPU cluster). Task mode is always
elastic; prefer it unless construction cost is real.
"""

from __future__ import annotations


def stage(ds, cls, *, args=(), kwargs=None, concurrency=None,
          batch_format="pyarrow", batch_size=None, **map_kwargs):
    kwargs = kwargs or {}
    mk = dict(batch_format=batch_format, **map_kwargs)
    if batch_size is not None:
        mk["batch_size"] = batch_size
    if concurrency is None:
        def fn(batch, _cls=cls, _a=args, _k=kwargs):
            return _cls(*_a, **_k)(batch)

        fn.__name__ = getattr(cls, "__name__", "stage")
        return ds.map_batches(fn, **mk)
    return ds.map_batches(
        cls,
        fn_constructor_args=args,
        fn_constructor_kwargs=kwargs,
        concurrency=concurrency,
        **mk,
    )
