"""Projection registry — create/persist projections.

Reference: ``internal/projections/service.go:20-39`` (CreateProjection =
compile + persist) and ``Runtime.Register``
(``internal/projections/projection.go:29-41``, duplicate-name error), with
the ``projections(name, query)`` catalog table
(``internal/backend/backend.go:55-58,291-309``).

The reference persists JS source text; our projections are Python specs,
so persistence stores the spec's metadata (name, selector, options,
output flag) as JSON next to the log, plus the live spec object in
memory. Re-registering a spec after restart re-supplies the callables —
same contract as recompiling stored JS source.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from eventstorm_spark.errors import ProjectionExistsError
from eventstorm_spark.projections.dsl import Projection


class ProjectionRegistry:
    def __init__(self, catalog_path: Optional[str] = None):
        self._projections: dict[str, Projection] = {}
        self._catalog_path = catalog_path

    def register(self, spec: Projection) -> None:
        """Runtime.Register — duplicate name is an error (projection.go:29-33)."""
        if spec.name in self._projections:
            raise ProjectionExistsError(f"projection already exists: {spec.name}")
        self._projections[spec.name] = spec
        self._persist(spec)

    def get(self, name: str) -> Optional[Projection]:
        return self._projections.get(name)

    def names(self) -> list[str]:
        return sorted(self._projections)

    def _persist(self, spec: Projection) -> None:
        if not self._catalog_path:
            return
        os.makedirs(self._catalog_path, exist_ok=True)
        doc = {
            "name": spec.name,
            "streams": list(spec.selector.streams) if spec.selector.streams else None,
            # category/pattern selectors must round-trip too — recording
            # only `streams` made from_category/from_streams_matching
            # projections indistinguishable from from_all in the catalog
            "category": spec.selector.category,
            "pattern": spec.selector.pattern,
            "output": spec.output,
            "options": {
                "resultStreamName": spec.opts.result_stream,
                "$includeLinks": spec.opts.include_links,
                "reorderEvents": spec.opts.reorder_events,
                "processingLag": spec.opts.processing_lag,
            },
        }
        with open(os.path.join(self._catalog_path, f"{spec.name}.json"), "w") as f:
            json.dump(doc, f, indent=2)
