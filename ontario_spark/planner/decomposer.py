"""Star decomposition + source selection.

Ports the reference mediator's planning semantics (not its code):

- ``bgp_stars`` (``ontario/mediator/Decomposer.py:120-136``): group the
  triples of a basic graph pattern by subject — a "star" is the unit of
  per-source pushdown.
- ``checkRDFTypeStatemnt`` / ``find_rdfmt_by_preds``
  (``Decomposer.py:184``, ``config/__init__.py:89-107``): candidate
  molecule selection by rdf:type constant, else by intersecting the
  predicate→MT index over the star's constant predicates.
- Multi-map stars: maps grouped per class; a class answers a star if
  the union of its maps' predicates covers the star (self-join across
  maps sharing the subject template — semantics of
  ``sparqltosql.join_condition:446-481``); several answering classes →
  UNION of alternatives (``sparqltosql.make_union:123-153``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ontario_spark.catalog.model import Catalog, TripleMap
from ontario_spark.sparql.ast import Term, Triple
from ontario_spark.sparql.parser import RDF_TYPE


class SourceSelectionError(Exception):
    pass


@dataclass
class Star:
    subject: Term
    triples: list[Triple] = field(default_factory=list)

    @property
    def predicates(self) -> list[str]:
        return [t.p.value for t in self.triples if t.p.is_iri and t.p.value != RDF_TYPE]

    @property
    def type_constraints(self) -> list[str]:
        return [
            t.o.value
            for t in self.triples
            if t.p.is_iri and t.p.value == RDF_TYPE and t.o.is_iri
        ]

    def variables(self) -> set[str]:
        out: set[str] = set()
        for t in self.triples:
            out |= t.variables()
        return out


def bgp_stars(triples: list[Triple]) -> list[Star]:
    """Group triples by subject term (var name or constant IRI)."""
    stars: dict[tuple, Star] = {}
    for t in triples:
        key = (t.s.kind, t.s.value)
        if key not in stars:
            stars[key] = Star(subject=t.s)
        stars[key].triples.append(t)
    return list(stars.values())


@dataclass
class StarPlan:
    """One way to answer a star: a UNION over alternatives, each
    alternative a list of TripleMaps self-joined on the shared subject
    template. Within an alternative, a triple is answered by the FIRST
    map providing its predicate (``compile_star``'s assignment rule —
    star.py:87)."""

    star: Star
    alternatives: list[list[TripleMap]]
    # Shape-group ordinal per alternative (parallel list). Branches in
    # the SAME group share a subject-template shape, so different maps
    # can assert the IDENTICAL triple (same subject URI, same
    # predicate/object) — RDF graphs are triple SETS, so compile_star
    # dedups within a multi-branch group; branches in different groups
    # generate differently-shaped URIs and union without dedup
    # (round-6 review fix: the round-5 per-class union double-counted
    # a solution when the same subject row existed in two class maps).
    alt_groups: "list[int] | None" = None


def prune_connected(plans: list[StarPlan]) -> list[StarPlan]:
    """MT-connectivity pruning (reference: ``Decomposer.prune``,
    ``mediator/Decomposer.py:209-287``): when star A links to star B via
    ``?a <p> ?b`` and B is the subject star of ``?b``, B's alternatives
    must have a subject template shape matching one of A's object-map
    templates for ``p`` — and vice versa. Alternatives that can't
    connect produce provably-empty join branches, so dropping them cuts
    scans; like the reference (:283-286), fall back to the unpruned set
    when pruning would leave nothing (recall over speed)."""
    by_subj: dict[str, StarPlan] = {
        p.star.subject.value: p for p in plans if p.star.subject.is_var
    }
    for plan in plans:
        for t in plan.star.triples:
            if not (t.p.is_iri and t.p.value != RDF_TYPE and t.o.is_var):
                continue
            target = by_subj.get(t.o.value)
            if target is None or target is plan:
                continue
            # shapes A can emit for this predicate — judged on each
            # alternative's ASSIGNED map (compile_star routes a triple
            # to the FIRST map providing its predicate, star.py:87); a
            # non-template assigned object map can emit ARBITRARY URIs,
            # so its presence makes static pruning unsound (round-5
            # review fix: any()-over-all-maps both over- and
            # under-approximated the emitted shapes)
            assigned = [
                next((tm.pom[t.p.value] for tm in alt if t.p.value in tm.pom), None)
                for alt in plan.alternatives
            ]
            assigned = [om for om in assigned if om is not None]
            # Forward pruning needs EVERY branch's assigned map to be a
            # template (a lexical map can emit arbitrary URIs, so the
            # emitted-shape set is unknowable); the reverse pass below
            # still runs — it reasons per-alternative and keeps lexical
            # links itself (round-6 review fix: a blanket `continue`
            # here also skipped the reverse pass, which is sound).
            if assigned and all(om.kind == "template" for om in assigned):
                shapes = [om.template for om in assigned]
                keep_idx = [
                    i
                    for i, alt in enumerate(target.alternatives)
                    # non-template (lexical) subjects hold full URIs the
                    # emitted shape may well produce: can't reason, keep
                    if alt[0].subject.kind != "template"
                    or any(alt[0].subject.template.same_shape(s) for s in shapes)
                ]
                if keep_idx:
                    _keep(target, keep_idx)
            # reverse: A alternatives whose emitted shape can't reach B
            tshapes = [
                alt[0].subject.template
                for alt in target.alternatives
                if alt[0].subject.kind == "template"
            ]
            if tshapes:

                def connects(alt: list[TripleMap]) -> bool:
                    # judge the ASSIGNED map (first providing the
                    # predicate — the one compile_star actually reads),
                    # not any() over the alternative (round-5 review
                    # fix: a template on a LATER map wrongly dropped an
                    # alternative whose assigned reference column can
                    # hold target-shaped URIs)
                    om = next(
                        (tm.pom[t.p.value] for tm in alt if t.p.value in tm.pom),
                        None,
                    )
                    if om is None or om.kind != "template":
                        return True  # lexical link: can't reason, keep
                    return any(om.template.same_shape(s) for s in tshapes)

                keep_idx = [
                    i
                    for i, alt in enumerate(plan.alternatives)
                    if connects(alt)
                ]
                if keep_idx:
                    _keep(plan, keep_idx)
    return plans


def _keep(plan: StarPlan, idx: list[int]) -> None:
    """Retain only the alternatives at ``idx``, keeping the parallel
    ``alt_groups`` list (dedup-scope bookkeeping) in sync."""
    plan.alternatives = [plan.alternatives[i] for i in idx]
    if plan.alt_groups is not None:
        plan.alt_groups = [plan.alt_groups[i] for i in idx]


def select_sources(cat: Catalog, star: Star) -> StarPlan:
    preds = star.predicates
    classes = star.type_constraints

    # Gather candidate maps: by class if constrained, else all maps
    # touching any star predicate (or every map when the star is only a
    # type scan / all-variable).
    if classes:
        cand_names: set[str] = set()
        for cls in classes:
            cand_names |= cat.maps_for_class(cls)
    elif preds:
        cand_names = set()
        for p in preds:
            cand_names |= cat.predicate_index.get(p, set())
    else:
        cand_names = set(cat.triple_maps)

    # Group candidates by JOINABLE SUBJECT SHAPE (template skeleton, or
    # the exact subject for reference/constant subjects): every map in
    # a group can self-join on the subject, so a group may combine maps
    # of different classes (a star with two rdf:type constraints joins
    # one carrier map per class) and maps of the same class but
    # different shapes land in different groups, each of which gets its
    # own chance to cover the star (previously the greedy cover could
    # pick a shape-mixed set, fail the joinability post-check, and
    # discard the whole class even though a shape-consistent subset
    # covered it).
    groups: dict[tuple[str, str], list[TripleMap]] = {}
    for name in sorted(cand_names):
        tm = cat.triple_maps[name]
        if tm.subject.kind == "template":
            key = ("tpl", tm.subject.template.shape_key())
        else:
            key = (tm.subject.kind, str(tm.subject.value))
        groups.setdefault(key, []).append(tm)

    def greedy_cover(maps: list[TripleMap]) -> "list[TripleMap] | None":
        """Smallest-ish self-joinable subset of ``maps`` covering every
        star predicate (biggest contributors first); None if the set
        cannot cover."""
        covered: set[str] = set()
        for tm in maps:
            covered |= set(tm.pom)
        if not set(preds) <= covered:
            return None
        chosen: list[TripleMap] = []
        need = set(preds)
        for tm in sorted(maps, key=lambda m: -len(set(m.pom) & set(preds))):
            gain = set(tm.pom) & need
            if gain or (not chosen and not preds):
                chosen.append(tm)
                need -= gain
            if not need and chosen:
                break
        return chosen if not need and chosen else None

    alternatives: list[list[TripleMap]] = []
    alt_groups: list[int] = []
    for gid, (_, maps) in enumerate(sorted(groups.items())):
        if classes:
            # every type constraint needs a carrier map in THIS group;
            # the single cover joins one carrier per class
            if not all(
                any(tm.subject_class == cls for tm in maps) for cls in classes
            ):
                continue
            chosen = greedy_cover(maps)
            if chosen is None:
                continue
            # each constrained class gets a carrier (the type triple
            # routes to it in compile_star); subject self-join enforces
            # conjunction
            for cls in sorted(classes):
                if not any(tm.subject_class == cls for tm in chosen):
                    chosen.append(
                        next(tm for tm in maps if tm.subject_class == cls)
                    )
            alternatives.append(chosen)
            alt_groups.append(gid)
            continue
        # No type constraint: each MOLECULE (class) in the shape group
        # answers independently — one UNION branch per class that
        # covers the star (round-5 review fix: one greedy cover per
        # shape group silently dropped same-shape maps of OTHER classes
        # that also answered; reference posture: make_union per
        # RDF-MT). Classless maps stay together as one molecule so
        # split catalogs without rr:class keep their self-join cover.
        by_cls: dict[str, list[TripleMap]] = {}
        for tm in maps:
            by_cls.setdefault(tm.subject_class or "", []).append(tm)
        branch_added = False
        for _, cmaps in sorted(by_cls.items()):
            if not preds:
                # pure type/all-variable scan: every map contributes
                # its own subjects — one branch per map
                for tm in cmaps:
                    alternatives.append([tm])
                    alt_groups.append(gid)
                branch_added = True
                continue
            chosen = greedy_cover(cmaps)
            if chosen is not None:
                alternatives.append(chosen)
                alt_groups.append(gid)
                branch_added = True
        if preds and not branch_added:
            # No single class covers the star, but the WHOLE shape
            # group might: maps of different classes (or classless +
            # classed) sharing a subject template self-join on the
            # subject to cover it jointly (round-6 review fix: the
            # per-class split alone made previously-answerable
            # cross-class stars raise SourceSelectionError).
            # Documented approximation boundary (reference parity,
            # MULDER/Ontario molecule posture): when SOME class covers,
            # cross-class combinations are NOT additionally unioned —
            # full BGP completeness would need the cross-product of
            # per-predicate map assignments, which neither engine
            # enumerates.
            chosen = greedy_cover(maps)
            if chosen is not None:
                alternatives.append(chosen)
                alt_groups.append(gid)

    return StarPlan(star=star, alternatives=alternatives, alt_groups=alt_groups)
