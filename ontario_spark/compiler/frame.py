"""BindingsFrame: a DataFrame of SPARQL solution mappings + per-variable
term metadata.

The reference streams Python dicts between operator processes
(SURVEY.md §1.1); here a binding set is a DataFrame whose columns are
the SPARQL variables. The twist that matters at 100 TB: variables bound
from URI TEMPLATES are kept as their underlying NATIVE KEY COLUMNS
(``var__k0..kN``) instead of formatted URI strings. Joins between stars
whose templates share the same literal skeleton run directly on the
integer keys — no string materialization, smaller shuffle payloads, and
parquet min/max stats stay usable. Lexical URIs are only produced at
projection time (reference contrast: tuple-level Python URI building in
``ontario/wrappers/spark/sparql2spark.py:189-229``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ontario_spark.catalog.model import Template

LEXICAL = "lexical"
KEYED = "keyed"


@dataclass(frozen=True)
class TermMeta:
    kind: str  # LEXICAL | KEYED
    template: Template | None = None

    @property
    def nkeys(self) -> int:
        return len(self.template.columns) if self.template else 0


def key_cols(var: str, n: int) -> list[str]:
    return [f"{var}__k{i}" for i in range(n)]


@dataclass
class BFrame:
    df: DataFrame
    meta: dict[str, TermMeta]

    @property
    def variables(self) -> set[str]:
        return set(self.meta)

    def cols_for(self, var: str) -> list[str]:
        m = self.meta[var]
        return key_cols(var, m.nkeys) if m.kind == KEYED else [var]

    def lexical_expr(self, var: str) -> Column:
        """Column producing the lexical form of ``var`` (formats keyed
        vars through their template; null keys → null, so OPTIONAL-
        produced unbound stays unbound)."""
        m = self.meta[var]
        if m.kind == LEXICAL:
            return F.col(var)
        kcols = key_cols(var, m.nkeys)
        formatted = m.template.format(
            col=lambda name: F.col(kcols[list(m.template.columns).index(name)])
        )
        notnull = F.lit(True)
        for k in kcols:
            notnull = notnull & F.col(k).isNotNull()
        return F.when(notnull, formatted)

    def materialize(self, var: str) -> "BFrame":
        """Convert a keyed var to its lexical string column."""
        m = self.meta[var]
        if m.kind == LEXICAL:
            return self
        df = self.df.withColumn(var, self.lexical_expr(var)).drop(
            *key_cols(var, m.nkeys)
        )
        meta = dict(self.meta)
        meta[var] = TermMeta(LEXICAL)
        return BFrame(df, meta)

    def ensure_var(self, var: str) -> "BFrame":
        """Add ``var`` as an unbound (null string) column if missing —
        union alignment (reference: Xunion.differentVariables pads with
        '', ``Xunion.py:83-133``; we use NULL = SPARQL unbound)."""
        if var in self.meta:
            return self
        df = self.df.withColumn(var, F.lit(None).cast("string"))
        meta = dict(self.meta)
        meta[var] = TermMeta(LEXICAL)
        return BFrame(df, meta)

    def join(self, other: "BFrame", how: str = "inner") -> "BFrame":
        """Join on shared variables. Keyed⋈keyed with same template
        shape joins on raw keys (replaces Xgjoin/SymmetricHashJoin —
        Spark's shuffled-hash/sort-merge with AQE already provides the
        adaptive, spilling behavior the reference hand-built,
        ``Xgjoin.py:51-266``). how='left_outer' replaces Xgoptional."""
        left, right = self, other
        shared = sorted(left.variables & right.variables)
        if not shared:
            if how == "left_outer":
                # LeftJoin with disjoint domains: every pairing is
                # compatible → Ω1 × Ω2, and Ω1 bare when Ω2 is empty —
                # exactly a TRUE-condition left outer join (arises e.g.
                # for OPTIONAL over a failed SERVICE SILENT's identity)
                return BFrame(
                    left.df.join(right.df, F.lit(True), "left_outer"),
                    {**left.meta, **right.meta},
                )
            if how != "inner":
                raise ValueError(f"{how} join without shared variables unsupported")
            return BFrame(left.df.crossJoin(right.df), {**left.meta, **right.meta})
        on: list[str] = []
        for v in shared:
            lm, rm = left.meta[v], right.meta[v]
            if (
                lm.kind == KEYED
                and rm.kind == KEYED
                and lm.template.same_shape(rm.template)
            ):
                on.extend(key_cols(v, lm.nkeys))
            else:
                left = left.materialize(v)
                right = right.materialize(v)
                # LEXICAL columns may carry different native dtypes (a
                # typed VALUES/subselect column vs a string star
                # column): unify on the lexical string form — a native
                # string=long comparison THROWS CAST_INVALID_INPUT
                # under Spark 4's default ANSI mode, and lexical
                # comparison is the engine-wide join convention
                # (round-8 review fix)
                if (
                    left.df.schema[v].dataType
                    != right.df.schema[v].dataType
                ):
                    left = BFrame(
                        left.df.withColumn(v, F.col(v).cast("string")),
                        left.meta,
                    )
                    right = BFrame(
                        right.df.withColumn(v, F.col(v).cast("string")),
                        right.meta,
                    )
                on.append(v)
        # SPARQL-JSON term side columns (var__type/__lang/__dt from
        # SERVICE frames) are physical df columns outside meta; when
        # BOTH sides carry them for a shared var the join would emit
        # duplicate names and a later LANG()/DATATYPE() reference would
        # be ambiguous. Left's metadata wins (matches the meta merge).
        dup_side = [
            f"{v}{suf}"
            for v in shared
            for suf in ("__type", "__lang", "__dt")
            if f"{v}{suf}" in left.df.columns and f"{v}{suf}" in right.df.columns
        ]
        rdf = right.df.drop(*dup_side) if dup_side else right.df
        df = left.df.join(rdf, on=on, how=how)
        meta = {**right.meta, **left.meta}  # left rep wins for shared vars
        return BFrame(df, meta)

    def restrict(self, other: "BFrame", how: str) -> "BFrame":
        """Semi/anti join on shared variables: EXISTS → 'left_semi',
        NOT EXISTS / MINUS → 'left_anti' (SPARQL 1.1, beyond the
        reference). Keyed vars with matching templates compare on raw
        keys, like ``join``. With no shared variables the right side
        acts as a global emptiness probe (EXISTS of a disjoint pattern).

        Note: a left row whose shared var is unbound (NULL) never
        matches — the common-case approximation of SPARQL compatibility
        (a fully unbound shared var is spec-compatible with anything).
        """
        assert how in ("left_semi", "left_anti")
        left, right = self, other
        shared = sorted(left.variables & right.variables)
        if not shared:
            probe = right.df.limit(1).select(F.lit(1).alias("__exists"))
            return BFrame(
                left.df.join(F.broadcast(probe), F.lit(True), how), left.meta
            )
        on: list[str] = []
        for v in shared:
            lm, rm = left.meta[v], right.meta[v]
            if (
                lm.kind == KEYED
                and rm.kind == KEYED
                and lm.template.same_shape(rm.template)
            ):
                on.extend(key_cols(v, lm.nkeys))
            else:
                left = left.materialize(v)
                right = right.materialize(v)
                # dtype-mismatched LEXICAL columns compare on string
                # forms (same ANSI-safety rule as join(), above)
                if (
                    left.df.schema[v].dataType
                    != right.df.schema[v].dataType
                ):
                    left = BFrame(
                        left.df.withColumn(v, F.col(v).cast("string")),
                        left.meta,
                    )
                    right = BFrame(
                        right.df.withColumn(v, F.col(v).cast("string")),
                        right.meta,
                    )
                on.append(v)
        # no dedup on the right: semi/anti joins never multiply rows,
        # so Spark needs only the join columns (column-pruned scan)
        rcols = [c for v in shared for c in right.cols_for(v)]
        df = left.df.join(right.df.select(*rcols), on=on, how=how)
        return BFrame(df, left.meta)

    def union(self, other: "BFrame") -> "BFrame":
        """Bag union (replaces Xunion). Variables are aligned by name;
        missing vars pad with NULL; keyed vars with mismatched templates
        are materialized first."""
        left, right = self, other
        for v in sorted(left.variables | right.variables):
            lin, rin = v in left.meta, v in right.meta
            if lin and rin:
                lm, rm = left.meta[v], right.meta[v]
                compatible = (
                    lm.kind == KEYED
                    and rm.kind == KEYED
                    and lm.template.same_shape(rm.template)
                    # same-shape templates over sources with DIFFERENT
                    # native key dtypes (int parquet vs string csv)
                    # cannot union raw key columns under ANSI — fall
                    # through to materialize (round-5 review fix)
                    and [
                        left.df.schema[c].dataType
                        for c in key_cols(v, lm.nkeys)
                    ]
                    == [
                        right.df.schema[c].dataType
                        for c in key_cols(v, rm.nkeys)
                    ]
                ) or (lm.kind == LEXICAL and rm.kind == LEXICAL)
                if not compatible:
                    left = left.materialize(v)
                    right = right.materialize(v)
                if left.meta[v].kind == LEXICAL and right.meta[v].kind == LEXICAL:
                    # LEXICAL vars may still carry different native
                    # dtypes (double vs timestamp across negated-path
                    # branches) — unify on the lexical string form
                    lt = left.df.schema[v].dataType
                    rt = right.df.schema[v].dataType
                    if lt != rt:
                        left = BFrame(
                            left.df.withColumn(v, F.col(v).cast("string")),
                            left.meta,
                        )
                        right = BFrame(
                            right.df.withColumn(v, F.col(v).cast("string")),
                            right.meta,
                        )
            else:
                if lin:
                    left = left.materialize(v)
                if rin:
                    right = right.materialize(v)
                left = left.ensure_var(v)
                right = right.ensure_var(v)
        cols = sorted(c for v in left.meta for c in left.cols_for(v))
        # Non-meta PHYSICAL columns survive the union (round-8 review
        # fix: they were silently dropped): hoisted ``__sN`` ORDER-BY
        # aggregate columns (their loss crashed the post-union sort
        # select) and SERVICE term-fidelity side columns
        # (var__type/__lang/__dt — their loss silently blanked
        # LANG()/DATATYPE() after a union). A side missing the column
        # pads with a typed NULL; dtype conflicts across branches fall
        # back to the lexical string form like LEXICAL vars above.
        ldf, rdf = left.df, right.df
        extras = sorted(
            (set(ldf.columns) | set(rdf.columns)) - set(cols)
        )
        for c in extras:
            if c not in ldf.columns:
                ldf = ldf.withColumn(
                    c, F.lit(None).cast(rdf.schema[c].dataType)
                )
            elif c not in rdf.columns:
                rdf = rdf.withColumn(
                    c, F.lit(None).cast(ldf.schema[c].dataType)
                )
            if ldf.schema[c].dataType != rdf.schema[c].dataType:
                ldf = ldf.withColumn(c, F.col(c).cast("string"))
                rdf = rdf.withColumn(c, F.col(c).cast("string"))
        ldf = ldf.select(*cols, *extras)
        rdf = rdf.select(*cols, *extras)
        return BFrame(ldf.unionByName(rdf), dict(left.meta))

    def project(self, variables: list[str]) -> "BFrame":
        out = self
        for v in variables:
            if v not in out.meta:
                out = out.ensure_var(v)
            out = out.materialize(v)
        return BFrame(out.df.select(*variables), {v: out.meta[v] for v in variables})
