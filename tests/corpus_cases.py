"""Shared edge-case documents for chunker tests (FIXTURES.md §1 content rules).

Deterministic, no external data. Used by both the pure-Python conformance
tests and the Spark UDF tests.
"""

from __future__ import annotations

import random

PY_DOC = (
    "import os\nimport sys\n\n\nclass Loader:\n"
    '    """Loads things.\n\n    Long docstring paragraph here.\n    """\n\n'
    "    def load(self, path):\n        return open(path).read()\n\n"
    "\tdef tab_indented(self):\n\t\treturn 42\n\n"
    "def main():\n    loader = Loader()\n    print(loader.load(sys.argv[1]))\n\n"
    "def helper_function_with_a_very_long_name_and_body():\n"
    "    value = " + " + ".join(f"x{i}" for i in range(120)) + "\n"
    "    return value\n\n\nif __name__ == '__main__':\n    main()\n"
)

PROSE_DOC = (
    "The quick brown fox jumps over the lazy dog. Does it though? Yes! "
    "It certainly does.\n\nA second paragraph follows here, with more "
    "sentences. Some are short. Others ramble on for a while before finally "
    "coming to an end, as sentences sometimes do!\n\nThird paragraph.\n"
    "Line two of the third paragraph.\nLine three."
)

EDGE_DOCS: list[tuple[str, str]] = [
    ("python", PY_DOC),
    ("markdown", PROSE_DOC),
    ("python", ""),  # empty
    ("python", "   \n\n \t  "),  # whitespace only
    ("go", "x"),  # single char
    ("c", "A" * 2000),  # one oversized token, no separators at all
    ("js", "word " * 300),  # many small pieces, space separator
    ("python", "def f():\n    pass\n" * 100),  # repetitive defs (hot terms)
    ("markdown", "Sentence." * 100),  # period separator stress
    ("python", "émojis 🎉 and ünïcode ідентифікатор.\n\nSecond пара."),
    ("java", "a\n\nb\n\nc\n\n" + "d" * 399 + "\n\ne"),  # boundary at chunk_size-1
    ("java", "e" * 400),  # exactly chunk_size (NOT < chunk_size -> oversized path)
    ("java", "f" * 401 + "\n" + "g" * 10),
    ("markdown", "\n\n\n\nleading separators"),
    ("markdown", "trailing separators\n\n\n\n"),
    ("markdown", ".?! mixed ?. punctuation !?."),
    ("python", "\nclass A:\n pass\nclass B:\n pass\ndef g(): pass"),
    ("markdown", "no separators but exactly 400 chars " + "h" * 364),
    ("markdown", "tab\tseparated\tonly\ttokens"),  # tabs aren't separators
]


def random_docs(n: int, seed: int = 42) -> list[tuple[str, str]]:
    """Seeded pseudo-random documents mixing prose and code shapes."""
    rng = random.Random(seed)
    words = [
        "def", "import", "return", "class", "self", "data", "index", "query",
        "spark", "merge", "token", "chunk", "score", "batch", "fox", "dog",
    ]
    out: list[tuple[str, str]] = []
    for i in range(n):
        parts: list[str] = []
        for _ in range(rng.randint(1, 40)):
            k = rng.randint(1, 14)
            sent = " ".join(rng.choice(words) for _ in range(k))
            parts.append(sent + rng.choice([". ", "? ", "! ", "\n", "\n\n", " "]))
        lang = rng.choice(["python", "java", "go", "markdown", "js", "c"])
        out.append((lang, "".join(parts)))
    return out
