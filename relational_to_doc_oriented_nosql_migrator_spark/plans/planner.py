"""IR#2 — schema-conversion planner (the reference's "query planner").

Driver-side pure Python over metadata; decides the output document schema.
Reproduces, rule for rule, the reference's conversion logic:

- processing order (Kahn-style BFS seeded by 0-FK tables, with a
  self-referencing fallback): reference server/DBMigration.js:194-262
- self-reference detection: server/DBMigration.js:184-192
- embed-vs-reference decision: server/DBMigration.js:335-392
    0 FKs                      -> new root collection        (:343-346)
    self-referencing           -> referencing                (:349-352)
    >2 FKs                     -> referencing                (:383-386)
    <=2 FKs and (uaf > maf or a referencing table's uaf > maf)
                               -> referencing                (:356-369)
    else 2 FKs                 -> two-way embed              (:375-377)
    else 1 FK                  -> one-way embed              (:378-381)
- one-way embed (drop the FK column): server/DBMigration.js:265-280
- two-way embed (junction into both endpoints, denormalizing the other
  endpoint's attributes): server/DBMigration.js:283-317
- referencing (FK columns renamed *_REF): server/DBMigration.js:319-333
- embedding may target an already-embedded collection — BFS lookup:
  server/models/NoSQLDatabase.js:13-27
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from relational_to_doc_oriented_nosql_migrator_spark.plans.catalog import (
    Catalog,
    TableMeta,
)


@dataclass
class Collection:
    """A (possibly embedded) output collection.

    `attributes` is the ordered output field list; embedded children land
    after the attributes under their own table-name key. For a two-way
    embedded junction, `embedded_attributes_from` names the other endpoint
    whose attributes are denormalized into each junction document.
    """

    name: str
    attributes: list[str]
    embedded: list["Collection"] = field(default_factory=list)
    embedded_attributes_from: str | None = None

    def find(self, name: str) -> "Collection | None":
        """BFS through nested embedded collections (reference
        server/models/NoSQLDatabase.js:13-27 does the same search)."""
        queue = deque([self])
        while queue:
            current = queue.popleft()
            if current.name == name:
                return current
            queue.extend(current.embedded)
        return None


@dataclass
class NoSQLPlan:
    name: str
    collections: list[Collection] = field(default_factory=list)

    def get_collection(self, name: str) -> Collection | None:
        for root in self.collections:
            found = root.find(name)
            if found is not None:
                return found
        return None


def is_self_referencing(table: TableMeta) -> bool:
    return any(fk.referenced_table == table.name for fk in table.foreign_keys)


def create_table_queue(catalog: Catalog) -> list[TableMeta]:
    """Processing order: seed with 0-FK tables (or, failing that,
    self-referencing 1-FK tables), then repeatedly admit referencing tables
    whose referenced tables have all been admitted (self-references exempt).

    Tables that never become admissible are *not* processed — matching the
    reference, which silently drops them from the output schema.
    """
    queue: list[TableMeta] = []
    remaining = list(catalog.tables.values())
    evaluation = deque()

    for table in list(remaining):
        if table.num_foreign_keys == 0:
            queue.append(table)
            evaluation.append(table)
            remaining.remove(table)

    if not queue:
        for table in list(remaining):
            if table.num_foreign_keys == 1 and is_self_referencing(table):
                queue.append(table)
                evaluation.append(table)
                remaining.remove(table)

    admitted = {t.name for t in queue}
    while evaluation:
        current = evaluation.popleft()
        if not current.is_referenced:
            continue
        for ref_name in current.referencing_tables:
            ref_table = catalog.get_table(ref_name)
            if ref_table is None or ref_table not in remaining:
                continue
            if ref_table.num_foreign_keys == 1:
                ready = True
            else:
                ready = all(
                    fk.referenced_table in admitted
                    or fk.referenced_table == ref_table.name
                    for fk in ref_table.foreign_keys
                )
            if ready:
                queue.append(ref_table)
                evaluation.append(ref_table)
                admitted.add(ref_table.name)
                remaining.remove(ref_table)

    return queue


def _one_way_embed(plan: NoSQLPlan, table: TableMeta) -> None:
    fk = table.foreign_keys[0]
    parent = plan.get_collection(fk.referenced_table)
    attributes = [c for c in table.columns if c != fk.column]
    parent.embedded.append(Collection(table.name, attributes))


def _two_way_embed(catalog: Catalog, plan: NoSQLPlan, table: TableMeta) -> None:
    fk1, fk2 = table.foreign_keys[0], table.foreign_keys[1]
    endpoint1 = plan.get_collection(fk1.referenced_table)
    endpoint2 = plan.get_collection(fk2.referenced_table)
    table1 = catalog.get_table(fk1.referenced_table)
    table2 = catalog.get_table(fk2.referenced_table)

    junction_attrs = [
        c for c in table.columns if c != fk1.column and c != fk2.column
    ]
    # Each copy denormalizes the OTHER endpoint's columns (minus the column
    # the junction references there).
    attrs_into_1 = junction_attrs + [
        c for c in table2.columns if c != fk2.referenced_column
    ]
    attrs_into_2 = junction_attrs + [
        c for c in table1.columns if c != fk1.referenced_column
    ]

    emb1 = Collection(table.name, attrs_into_1,
                      embedded_attributes_from=endpoint2.name)
    emb2 = Collection(table.name, attrs_into_2,
                      embedded_attributes_from=endpoint1.name)
    endpoint1.embedded.append(emb1)
    endpoint2.embedded.append(emb2)


def _referencing(plan: NoSQLPlan, table: TableMeta) -> None:
    fk_columns = {fk.column for fk in table.foreign_keys}
    attributes = [
        c + "_REF" if c in fk_columns else c for c in table.columns
    ]
    plan.collections.append(Collection(table.name, attributes))


def classify_tables(catalog: Catalog) -> list[tuple[TableMeta, str]]:
    """Label every table in processing order with its embed-vs-reference
    decision (the rule cascade of server/DBMigration.js:335-392). This is
    the single decision point — `convert_schema` dispatches on these labels,
    and the `plan_embed_or_reference` registry query exposes them.
    """
    maf = catalog.maf
    out: list[tuple[TableMeta, str]] = []
    for table in create_table_queue(catalog):
        if table.num_foreign_keys == 0:
            decision = "root"
        elif is_self_referencing(table):
            decision = "reference_self"
        elif table.num_foreign_keys <= 2:
            use_referencing = table.uaf > maf
            if table.is_referenced and not use_referencing:
                use_referencing = any(
                    catalog.get_table(r).uaf > maf
                    for r in table.referencing_tables
                    if catalog.get_table(r) is not None
                )
            if use_referencing:
                decision = "reference_workload"
            elif table.num_foreign_keys == 2:
                decision = "embed_two_way"
            else:
                decision = "embed_one_way"
        else:
            decision = "reference_many_fks"
        out.append((table, decision))
    return out


def convert_schema(catalog: Catalog, name: str = "db") -> NoSQLPlan:
    """Run the embed-vs-reference rules over the processing queue."""
    plan = NoSQLPlan(name)

    for table, decision in classify_tables(catalog):
        if decision == "root":
            plan.collections.append(Collection(table.name, list(table.columns)))
        elif decision == "embed_two_way":
            _two_way_embed(catalog, plan, table)
        elif decision == "embed_one_way":
            _one_way_embed(plan, table)
        else:
            _referencing(plan, table)

    return plan
