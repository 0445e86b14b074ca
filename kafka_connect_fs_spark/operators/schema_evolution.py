"""Schema-evolution detection: diff incoming batch schema vs table schema.

The reference has no schema evolution at all (each file carries its own
schema object; SURVEY.md §1.3) — this engine detects adds/renames/type
changes per batch, applies adds automatically (LakeTable union-by-name +
mergeSchema), applies renames via the metadata-only rename commit, and
surfaces the diff in batch metrics for lineage."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass
class SchemaDiff:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    type_changed: list[tuple[str, str, str]] = field(default_factory=list)
    renamed: dict[str, str] = field(default_factory=dict)

    @property
    def is_noop(self) -> bool:
        return not (self.added or self.removed or self.type_changed or self.renamed)

    def to_dict(self) -> dict:
        return {
            "added": self.added,
            "removed": self.removed,
            "type_changed": [list(t) for t in self.type_changed],
            "renamed": self.renamed,
        }


def diff_schemas(
    table_schema: T.StructType,
    batch_schema: T.StructType,
    rename_hints: dict[str, str] | None = None,
) -> SchemaDiff:
    """Columns in batch but not table → added; vice versa → removed (kept as
    nulls, never dropped); same name different type → type_changed.
    ``rename_hints`` (old→new) turn an add+remove pair into a rename."""
    hints = rename_hints or {}
    t_fields = {f.name: f.dataType.simpleString() for f in table_schema.fields}
    b_fields = {f.name: f.dataType.simpleString() for f in batch_schema.fields}
    d = SchemaDiff()
    for old, new in hints.items():
        # `new not in t_fields` guard: if the table ALREADY has the new
        # column (added by an earlier batch while `old` lingered), firing
        # the rename would create a duplicate-named field in the schema
        if (
            old in t_fields
            and new in b_fields
            and old not in b_fields
            and new not in t_fields
        ):
            d.renamed[old] = new
            t_fields[new] = t_fields.pop(old)
    for name, typ in b_fields.items():
        if name not in t_fields:
            d.added.append(name)
        elif t_fields[name] != typ:
            d.type_changed.append((name, t_fields[name], typ))
    for name in t_fields:
        if name not in b_fields:
            d.removed.append(name)
    d.added.sort()
    d.removed.sort()
    return d
