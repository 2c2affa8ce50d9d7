"""Extended AtomSpace: hypergraph atom store with truth values, pattern
queries, and ECAN attention allocation.

Python re-design of the reference's ExtendedAtomSpace / HypergraphUtils
(src/opencog-qat/extended-atomspace.h:21, hypergraph-utils.h).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class TruthValue:
    """ExtendedTruthValue (extended-atomspace.h:60-70)."""

    strength: float = 0.0  # probability the statement is true
    confidence: float = 0.0  # confidence in the strength estimate
    count: float = 1.0  # amount of evidence
    uncertainty: float = 0.0  # epistemic uncertainty

    def merge(self, other: "TruthValue") -> "TruthValue":
        """Evidence-weighted revision of two truth values."""
        total = self.count + other.count
        if total <= 0:
            return TruthValue()
        w1, w2 = self.count / total, other.count / total
        return TruthValue(
            strength=w1 * self.strength + w2 * other.strength,
            confidence=max(self.confidence, other.confidence),
            count=total,
            uncertainty=w1 * self.uncertainty + w2 * other.uncertainty,
        )


@dataclass
class Atom:
    id: int
    type: str  # e.g. "ConceptNode", "InheritanceLink"
    name: str = ""  # nodes only
    outgoing: tuple[int, ...] = ()  # links only: ordered target atom ids
    tv: TruthValue = field(default_factory=TruthValue)
    # ECAN attention values (sti = short-term importance, lti = long-term)
    sti: float = 0.0
    lti: float = 0.0
    vlti: bool = False  # very-long-term importance flag (never forget)

    @property
    def is_node(self) -> bool:
        return not self.outgoing

    @property
    def is_link(self) -> bool:
        return bool(self.outgoing)


class ExtendedAtomSpace:
    """Hypergraph store: atoms are nodes (typed, named) or links (typed,
    ordered outgoing sets). Supports pattern queries, incoming-set indexing,
    and an ECAN-style attention economy."""

    def __init__(self, attention_budget: float = 1000.0):
        self._atoms: dict[int, Atom] = {}
        self._next_id = 1
        self._node_index: dict[tuple[str, str], int] = {}  # (type, name) -> id
        self._incoming: dict[int, set[int]] = {}  # target id -> link ids
        self.attention_budget = attention_budget

    # -- construction ---------------------------------------------------------
    def add_node(self, type: str, name: str, tv: TruthValue | None = None) -> Atom:
        key = (type, name)
        if key in self._node_index:
            atom = self._atoms[self._node_index[key]]
            if tv is not None:
                atom.tv = atom.tv.merge(tv)
            return atom
        atom = Atom(self._next_id, type, name=name, tv=tv or TruthValue())
        self._atoms[atom.id] = atom
        self._node_index[key] = atom.id
        self._next_id += 1
        return atom

    def add_link(self, type: str, targets: list[Atom | int],
                 tv: TruthValue | None = None) -> Atom:
        ids = tuple(t.id if isinstance(t, Atom) else int(t) for t in targets)
        for tid in ids:
            if tid not in self._atoms:
                raise KeyError(f"unknown atom id {tid}")
        # dedup identical links
        for lid in self._incoming.get(ids[0], set()):
            link = self._atoms[lid]
            if link.type == type and link.outgoing == ids:
                if tv is not None:
                    link.tv = link.tv.merge(tv)
                return link
        atom = Atom(self._next_id, type, outgoing=ids, tv=tv or TruthValue())
        self._atoms[atom.id] = atom
        self._next_id += 1
        for tid in ids:
            self._incoming.setdefault(tid, set()).add(atom.id)
        return atom

    def remove(self, atom_id: int, recursive: bool = False) -> bool:
        atom = self._atoms.get(atom_id)
        if atom is None:
            return False
        incoming = list(self._incoming.get(atom_id, ()))
        if incoming:
            if not recursive:
                return False
            for lid in incoming:
                self.remove(lid, recursive=True)
        for tid in atom.outgoing:
            self._incoming.get(tid, set()).discard(atom_id)
        if atom.is_node:
            self._node_index.pop((atom.type, atom.name), None)
        self._incoming.pop(atom_id, None)
        del self._atoms[atom_id]
        return True

    # -- lookup / queries -----------------------------------------------------
    def __len__(self) -> int:
        return len(self._atoms)

    def get(self, atom_id: int) -> Atom | None:
        return self._atoms.get(atom_id)

    def node(self, type: str, name: str) -> Atom | None:
        aid = self._node_index.get((type, name))
        return self._atoms.get(aid) if aid is not None else None

    def incoming(self, atom: Atom | int) -> list[Atom]:
        aid = atom.id if isinstance(atom, Atom) else atom
        return [self._atoms[i] for i in sorted(self._incoming.get(aid, ()))]

    def atoms(self, type: str | None = None):
        for a in self._atoms.values():
            if type is None or a.type == type:
                yield a

    def query(self, type: str | None = None, name: str | None = None,
              targets: list[int | None] | None = None,
              min_strength: float = 0.0, min_confidence: float = 0.0) -> list[Atom]:
        """Pattern match: None fields are wildcards; `targets` matches link
        outgoing sets positionally (None = any)."""
        out = []
        for a in self._atoms.values():
            if type is not None and a.type != type:
                continue
            if name is not None and a.name != name:
                continue
            if targets is not None:
                if len(a.outgoing) != len(targets):
                    continue
                if any(t is not None and t != o for t, o in zip(targets, a.outgoing)):
                    continue
            if a.tv.strength < min_strength or a.tv.confidence < min_confidence:
                continue
            out.append(a)
        return out

    # -- ECAN attention allocation (extended-atomspace.h "attention") ---------
    def stimulate(self, atom: Atom | int, amount: float) -> None:
        a = self._atoms[atom.id if isinstance(atom, Atom) else atom]
        a.sti += amount

    def spread_attention(self, decay: float = 0.1, spread_factor: float = 0.2):
        """One ECAN step: STI decays, a fraction spreads along links, and the
        total is renormalized to the attention budget."""
        deltas: dict[int, float] = {}
        for a in self._atoms.values():
            if a.is_link and a.sti > 0:
                share = a.sti * spread_factor / max(len(a.outgoing), 1)
                for tid in a.outgoing:
                    deltas[tid] = deltas.get(tid, 0.0) + share
                deltas[a.id] = deltas.get(a.id, 0.0) - a.sti * spread_factor
        for aid, d in deltas.items():
            self._atoms[aid].sti += d
        total = 0.0
        for a in self._atoms.values():
            a.sti *= 1.0 - decay
            total += max(a.sti, 0.0)
        if total > self.attention_budget and total > 0:
            scale = self.attention_budget / total
            for a in self._atoms.values():
                a.sti *= scale

    def attentional_focus(self, k: int = 10) -> list[Atom]:
        return sorted(self._atoms.values(), key=lambda a: -a.sti)[:k]

    # -- serialization --------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps({
            "atoms": [
                {
                    "id": a.id, "type": a.type, "name": a.name,
                    "outgoing": list(a.outgoing),
                    "tv": [a.tv.strength, a.tv.confidence, a.tv.count, a.tv.uncertainty],
                    "sti": a.sti, "lti": a.lti,
                }
                for a in self._atoms.values()
            ]
        })

    @classmethod
    def from_json(cls, text: str) -> "ExtendedAtomSpace":
        space = cls()
        data = json.loads(text)
        for rec in data["atoms"]:
            atom = Atom(
                rec["id"], rec["type"], name=rec.get("name", ""),
                outgoing=tuple(rec.get("outgoing", ())),
                tv=TruthValue(*rec["tv"]), sti=rec.get("sti", 0.0),
                lti=rec.get("lti", 0.0),
            )
            space._atoms[atom.id] = atom
            space._next_id = max(space._next_id, atom.id + 1)
            if atom.is_node:
                space._node_index[(atom.type, atom.name)] = atom.id
            for tid in atom.outgoing:
                space._incoming.setdefault(tid, set()).add(atom.id)
        return space


class HypergraphUtils:
    """Traversal / centrality helpers (hypergraph-utils.h)."""

    @staticmethod
    def neighbors(space: ExtendedAtomSpace, atom: Atom) -> list[Atom]:
        """Hypergraph adjacency: links count as atoms — a node neighbors its
        incoming links; a link neighbors its targets and its incoming links."""
        out: dict[int, Atom] = {}
        for link in space.incoming(atom):
            out[link.id] = link
        for tid in atom.outgoing:
            out[tid] = space.get(tid)
        return list(out.values())

    @staticmethod
    def bfs(space: ExtendedAtomSpace, start: Atom, max_depth: int = -1) -> list[Atom]:
        seen = {start.id}
        order = [start]
        frontier = [start]
        depth = 0
        while frontier and (max_depth < 0 or depth < max_depth):
            nxt = []
            for a in frontier:
                for n in HypergraphUtils.neighbors(space, a):
                    if n.id not in seen:
                        seen.add(n.id)
                        order.append(n)
                        nxt.append(n)
            frontier = nxt
            depth += 1
        return order

    @staticmethod
    def degree_centrality(space: ExtendedAtomSpace) -> dict[int, float]:
        n = max(len(space) - 1, 1)
        return {
            a.id: (len(space.incoming(a)) + len(a.outgoing)) / n
            for a in space.atoms()
        }

    @staticmethod
    def connected_components(space: ExtendedAtomSpace) -> list[list[int]]:
        seen: set[int] = set()
        comps = []
        for a in space.atoms():
            if a.id in seen:
                continue
            comp = [x.id for x in HypergraphUtils.bfs(space, a)]
            seen.update(comp)
            comps.append(sorted(comp))
        return comps
