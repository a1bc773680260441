"""User-extension surface (SURVEY §2.11): pluggable, config-driven pipeline
assembly over the converter/stage/function library.

Gobblin analogs:
- ``AliasRegistry`` — ClassAliasResolver
  (gobblin-api/.../util/ClassAliasResolver.java): constructs are referenced
  by short alias from job config and resolved to classes/factories.
- ``Pipeline.from_config`` — config-driven job assembly: Source, Converter
  chain, policies, writer all picked by name from properties
  (gobblin-runtime/.../TaskContext.java getters).
- ``EmbeddedPipeline`` — the fluent embedded-driver API
  (gobblin-runtime/.../embedded/EmbeddedGobblin.java:122).

A pipeline spec is plain data (dict / JSON), e.g.::

    {
      "source": {"table": "events", "columns": ["event_type", "value"]},
      "transforms": [
        {"op": "filter_equals", "args": ["event_type", "purchase"]},
        {"op": "project", "args": [["event_type", "value"]]}
      ],
      "groupby": {"keys": ["event_type"],
                  "aggs": [{"fn": "sum", "col": "value", "alias": "total"}]},
      "limit": 10
    }

Every ``op`` resolves through the registry: stateless converter factories
become one fused ``map_batches`` chain segment; ``{"op": "actor", ...}``
inserts a stateful actor-pool stage (callable class, init-once per actor).
Users extend by ``ALIASES.register("my_op", factory)``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import pyarrow as pa


class AliasRegistry:
    """Alias -> factory/class resolver (ClassAliasResolver analog)."""

    def __init__(self):
        self._reg: dict[str, Callable] = {}

    def register(self, alias: str, obj: Callable, overwrite: bool = False) -> None:
        if alias in self._reg and not overwrite:
            raise ValueError(f"alias {alias!r} already registered")
        self._reg[alias] = obj

    def resolve(self, alias: str) -> Callable:
        try:
            return self._reg[alias]
        except KeyError:
            raise KeyError(
                f"unknown alias {alias!r}; registered: {sorted(self._reg)}"
            ) from None

    def known(self) -> list[str]:
        return sorted(self._reg)


def _default_registry() -> AliasRegistry:
    from .functions import dedup as dd
    from .functions import text as tx
    from .stages import converters as cv
    from .stages.partition import time_partition
    from .stages.quality import PolicyChecker

    reg = AliasRegistry()
    # Stateless converter factories (1:1 / 1:0 / 1:N batch transforms).
    for name in (
        "identity", "project", "drop_fields", "rename", "filter_equals",
        "regex_filter", "cast_column", "lower", "upper", "concat_fields",
        "parse_json_regex", "split_to_rows", "flatten_struct", "sample_mod",
        "sample_hash", "grok_parse", "compress_column", "decompress_column",
    ):
        reg.register(name, getattr(cv, name))
    reg.register("time_partition", time_partition)
    reg.register("content_hash", dd.content_hash_column)
    for name in ("token_count", "char_count", "bpe_ish_token_count",
                 "quality_features", "quality_score", "repetition_signals",
                 "redact_pii", "canonicalize_url", "token_window_spans"):
        reg.register(name, getattr(tx, name))
    reg.register("unpivot", cv.unpivot)
    # Stateful actor-pool stages (callable classes; init once per actor).
    from .stages.limiter import CountLimiter, RateLimiter, TimeLimiter

    reg.register("RateLimiter", RateLimiter)
    reg.register("CountLimiter", CountLimiter)
    reg.register("TimeLimiter", TimeLimiter)
    reg.register("BottomKShingler", dd.BottomKShingler)
    reg.register("Fingerprinter", tx.Fingerprinter)
    reg.register("LangId", tx.LangId)
    reg.register("MinHasher", dd.MinHasher)
    reg.register("SimHasher", dd.SimHasher)
    reg.register("ParseJson", cv.ParseJson)
    reg.register("PolicyChecker", PolicyChecker)
    return reg


ALIASES = _default_registry()

_AGGS = {"sum": "Sum", "mean": "Mean", "count": "Count", "min": "Min", "max": "Max"}


@dataclass
class Pipeline:
    """A declarative pipeline over one source table.

    Slots mirror the §2.11 RD mapping: source -> parse/batch transforms ->
    optional grouped aggregation -> optional sort/limit. ``run(sf_dir)``
    assembles the Ray Dataset lazily; nothing executes until consumed.
    """

    source: dict
    transforms: list[dict] = field(default_factory=list)
    groupby: dict | None = None
    sort: dict | None = None
    limit: int | None = None
    registry: AliasRegistry = field(default_factory=lambda: ALIASES)

    @classmethod
    def from_config(cls, spec: dict, registry: AliasRegistry | None = None):
        return cls(
            source=spec["source"],
            transforms=list(spec.get("transforms", [])),
            groupby=spec.get("groupby"),
            sort=spec.get("sort"),
            limit=spec.get("limit"),
            registry=registry or ALIASES,
        )

    # -- assembly --------------------------------------------------------

    def _source_ds(self, sf_dir: str):
        from .sources.readers import read_table

        src = self.source
        return read_table(sf_dir, src["table"], columns=src.get("columns"))

    def _build_step(self, step: dict):
        """Returns ('fn', batch_fn) or ('actor', cls, map_batches kwargs)."""
        op = step["op"]
        if op == "actor":
            cls = self.registry.resolve(step["alias"])
            kwargs = dict(
                fn_constructor_kwargs=step.get("kwargs", {}),
                batch_size=step.get("batch_size", 2048),
                concurrency=step.get("concurrency", 2),
            )
            return ("actor", cls, kwargs)
        factory = self.registry.resolve(op)
        fn = factory(*step.get("args", []), **step.get("kwargs", {}))
        return ("fn", fn)

    def dataset(self, sf_dir: str):
        from .stages import converters as cv

        ds = self._source_ds(sf_dir)
        # Fuse consecutive stateless transforms into ONE map_batches chain
        # (MultiConverter analog) so each actor stage cuts the chain but
        # adjacent pure fns cost a single operator.
        pending: list = []

        def flush(ds):
            nonlocal pending
            if pending:
                ds = ds.map_batches(
                    cv.chain(*pending), batch_format="pyarrow", batch_size=None
                )
                pending = []
            return ds

        for step in self.transforms:
            built = self._build_step(step)
            if built[0] == "fn":
                pending.append(built[1])
            else:
                ds = flush(ds)
                _, cls, kwargs = built
                ds = ds.map_batches(cls, batch_format="pyarrow", **kwargs)
        ds = flush(ds)

        if self.groupby:
            import ray.data.aggregate as agg

            keys = self.groupby["keys"]
            aggs = []
            for a in self.groupby["aggs"]:
                cls = getattr(agg, _AGGS[a["fn"]])
                if a["fn"] == "count":
                    aggs.append(cls(alias_name=a.get("alias", "count")))
                else:
                    aggs.append(cls(a["col"], alias_name=a.get("alias", a["col"])))
            ds = ds.groupby(keys[0] if len(keys) == 1 else keys).aggregate(*aggs)
        if self.sort:
            if self.limit is not None:
                from .stages.sorts import top_k

                ds = top_k(
                    ds, self.limit, self.sort["by"], self.sort.get("descending")
                    or [False] * len(self.sort["by"]),
                )
                return ds
            ds = ds.sort(
                self.sort["by"],
                descending=self.sort.get("descending") or [False] * len(self.sort["by"]),
            )
        if self.limit is not None:
            ds = ds.limit(self.limit)
        return ds

    def run(self, sf_dir: str):
        return self.dataset(sf_dir)


class EmbeddedPipeline:
    """Fluent builder (EmbeddedGobblin analog): chain calls, then ``run``.

    >>> EmbeddedPipeline("events", columns=["event_type", "value"]) \\
    ...     .transform("filter_equals", "event_type", "purchase") \\
    ...     .groupby(["event_type"], [{"fn": "count", "alias": "n"}]) \\
    ...     .run(sf_dir)
    """

    def __init__(self, table: str, columns: list[str] | None = None,
                 registry: AliasRegistry | None = None):
        self._spec: dict = {"source": {"table": table, "columns": columns},
                            "transforms": []}
        self._registry = registry

    def transform(self, op: str, *args, **kwargs) -> "EmbeddedPipeline":
        self._spec["transforms"].append({"op": op, "args": list(args), "kwargs": kwargs})
        return self

    def actor(self, alias: str, concurrency=2, batch_size=2048, **kwargs):
        self._spec["transforms"].append(
            {"op": "actor", "alias": alias, "kwargs": kwargs,
             "concurrency": concurrency, "batch_size": batch_size}
        )
        return self

    def groupby(self, keys: list[str], aggs: list[dict]) -> "EmbeddedPipeline":
        self._spec["groupby"] = {"keys": keys, "aggs": aggs}
        return self

    def sort(self, by: list[str], descending: list[bool] | None = None):
        self._spec["sort"] = {"by": by, "descending": descending}
        return self

    def limit(self, n: int) -> "EmbeddedPipeline":
        self._spec["limit"] = n
        return self

    def to_config(self) -> dict:
        return self._spec

    def run(self, sf_dir: str):
        return Pipeline.from_config(self._spec, self._registry).run(sf_dir)


class ConfigStore:
    """Hierarchical dataset-config management (gobblin-config-management
    analog: ``gobblin-config-management/gobblin-config-client/.../
    ConfigClient.java`` — config nodes keyed by dataset URI path, a child
    inheriting every ancestor's properties, plus explicit cross-tree
    imports resolved before the node's own overrides).

    Nodes are '/'-separated dataset paths (``/``, ``/tables``,
    ``/tables/events``, ``/tables/events/bucket=3``). ``resolve(path)``
    deep-merges configs root -> leaf, so the nearest ancestor wins per
    key; dict values merge recursively, scalars and LISTS override whole
    (a child replacing the transform chain replaces it, not appends).

    A node config may name imports under ``"__imports__": [paths...]`` —
    each imported path is itself resolved (recursively) and merged after
    the node's ancestors but before the node's own keys, mirroring the
    reference's include semantics. Import cycles raise.

    >>> store = ConfigStore()
    >>> store.put("/", {"source": {"columns": None}, "limit": 10})
    >>> store.put("/events", {"source": {"table": "events"}})
    >>> store.resolve("/events")["source"]
    {'columns': None, 'table': 'events'}
    >>> Pipeline.from_config(store.resolve("/events"))  # doctest: +ELLIPSIS
    Pipeline(...)
    """

    def __init__(self):
        self._nodes: dict[str, dict] = {}

    @staticmethod
    def _norm(path: str) -> str:
        parts = [p for p in path.split("/") if p]
        return "/" + "/".join(parts)

    def put(self, path: str, config: dict) -> None:
        self._nodes[self._norm(path)] = dict(config)

    def get(self, path: str) -> dict | None:
        """The node's OWN config (no inheritance), or None."""
        got = self._nodes.get(self._norm(path))
        return dict(got) if got is not None else None

    @staticmethod
    def _deep_merge(base: dict, over: dict) -> dict:
        out = dict(base)
        for k, v in over.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = ConfigStore._deep_merge(out[k], v)
            else:
                out[k] = v
        return out

    def _ancestry(self, path: str) -> list[str]:
        parts = [p for p in path.split("/") if p]
        chain = ["/"]
        for i in range(1, len(parts) + 1):
            chain.append("/" + "/".join(parts[:i]))
        return chain

    def resolve(self, path: str, _seen: frozenset = frozenset()) -> dict:
        """Effective config at ``path``: ancestors root->leaf, each node's
        imports, then the node's own keys."""
        merged: dict = {}
        for node in self._ancestry(self._norm(path)):
            own = self._nodes.get(node)
            if own is None:
                continue
            if node in _seen:
                raise ValueError(f"config import cycle through {node!r}")
            for imp in own.get("__imports__", []):
                merged = self._deep_merge(
                    merged, self.resolve(imp, _seen | {node})
                )
            merged = self._deep_merge(
                merged, {k: v for k, v in own.items() if k != "__imports__"}
            )
        return merged

    def pipeline(self, path: str, registry: AliasRegistry | None = None) -> Pipeline:
        """Assemble the dataset's effective Pipeline."""
        return Pipeline.from_config(self.resolve(path), registry)

    # -- persistence (one JSON per store) ---------------------------------
    def to_json(self) -> dict:
        return {k: self._nodes[k] for k in sorted(self._nodes)}

    @classmethod
    def from_json(cls, d: dict) -> "ConfigStore":
        s = cls()
        for k, v in d.items():
            s.put(k, v)
        return s
