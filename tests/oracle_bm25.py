"""Brute-force inverted index + BM25 oracle (pure Python/NumPy, no Spark).

Transparent reimplementation used as the correctness target for the engine's
index build and query paths (SURVEY.md §5 items 2-3). Same tokenizer spec
(config.TOKEN_PATTERN), same Lucene-style BM25, same tie-breaks
(score desc, doc_id asc), tolerance 1e-6 on scores.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from quickb_spark.config import BM25_B, BM25_K1
from quickb_spark.functions.tokenize import tokenize_py


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]]):
        """docs: [(doc_id, text)] — typically the Spark-produced chunks."""
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize_py(text)
            if not toks:
                continue
            self.doc_len[doc_id] = len(toks)
            pos: dict[str, list[int]] = defaultdict(list)
            for i, t in enumerate(toks):
                pos[t].append(i)
            for t, p in pos.items():
                self.postings[t][doc_id] = p
        self.n_docs = len(self.doc_len)
        self.avgdl = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(len(p) for p in self.postings.get(term, {}).values())

    def idf(self, term: str) -> float:
        d = self.df(term)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))

    def score(self, query: str, k1: float = BM25_K1, b: float = BM25_B) -> dict[int, float]:
        scores: dict[int, float] = Counter()
        for term in set(tokenize_py(query)):
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for doc_id, positions in plist.items():
                tf = float(len(positions))
                dl = self.doc_len[doc_id]
                norm = tf + k1 * (1.0 - b + b * dl / self.avgdl)
                scores[doc_id] += idf * tf * (k1 + 1.0) / norm
        return dict(scores)

    def topk(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """-> [(rank, doc_id, score)] with deterministic tie-breaks."""
        scored = sorted(self.score(query).items(), key=lambda t: (-t[1], t[0]))
        return [(r + 1, d, s) for r, (d, s) in enumerate(scored[:k])]

    def phrase_docs(self, query: str, slop: int = 0) -> set[int]:
        """Docs whose token stream contains the query's tokens IN ORDER
        with successive-token position gaps in [1, slop + 1] (slop=0: the
        exact-phrase predicate — consecutive tokens; positions are 0-based
        token offsets). slop=0 keeps the original set-offset formulation;
        slop>0 runs an independent forward chain DP (the set of positions
        of term i that can end a valid in-order chain)."""
        seq = tokenize_py(query)
        if not seq or any(t not in self.postings for t in seq):
            return set()
        out = set()
        cand = set(self.postings[seq[0]])
        for t in seq[1:]:
            cand &= set(self.postings[t])
        for doc_id in cand:
            if slop == 0:
                starts = set(self.postings[seq[0]][doc_id])
                for off, t in enumerate(seq[1:], start=1):
                    starts &= {p - off for p in self.postings[t][doc_id]}
                    if not starts:
                        break
                if starts:
                    out.add(doc_id)
            else:
                ends = set(self.postings[seq[0]][doc_id])
                for t in seq[1:]:
                    ends = {
                        p
                        for p in self.postings[t][doc_id]
                        if any(1 <= p - q <= slop + 1 for q in ends)
                    }
                    if not ends:
                        break
                if ends:
                    out.add(doc_id)
        return out

    def phrase_topk(
        self, query: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, int, float]]:
        """Phrase top-k: BM25 scores unchanged, result set restricted to
        phrase-matching docs (gaps <= slop + 1), same
        (score desc, doc_id asc) ranking."""
        match = self.phrase_docs(query, slop=slop)
        scored = sorted(
            ((d, s) for d, s in self.score(query).items() if d in match),
            key=lambda t: (-t[1], t[0]),
        )
        return [(r + 1, d, s) for r, (d, s) in enumerate(scored[:k])]

    def conj_docs(self, query: str) -> set[int]:
        """Docs containing EVERY distinct query token (the conjunctive /
        AND-mode predicate); empty when any token is corpus-absent."""
        terms = set(tokenize_py(query))
        if not terms or any(t not in self.postings for t in terms):
            return set()
        cand: set[int] | None = None
        for t in terms:
            ds = set(self.postings[t])
            cand = ds if cand is None else cand & ds
        return cand or set()

    def conj_topk(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """Conjunctive top-k: BM25 scores unchanged, result set restricted
        to all-terms-matching docs, same (score desc, doc_id asc) ranking."""
        match = self.conj_docs(query)
        scored = sorted(
            ((d, s) for d, s in self.score(query).items() if d in match),
            key=lambda t: (-t[1], t[0]),
        )
        return [(r + 1, d, s) for r, (d, s) in enumerate(scored[:k])]
