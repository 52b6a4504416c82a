"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema pinned by BASELINE.json input_hint:
    repo:string, path:string, commit:string, lang:string, content:string

Content is templated source code with a deliberately Zipfian keyword mix
('fn', 'import', 'def', 'self', 'return', ...) to exercise hot-token salting,
camelCase + snake_case identifiers from a seeded vocabulary, and a small
fraction of non-Latin comment lines (Chinese/Greek/Arabic/Thai samples) to
exercise script-run splitting. Pure function of (n_rows, seed) — no external
data."""

from __future__ import annotations

import hashlib

import numpy as np

_KEYWORDS = [
    "fn", "import", "def", "self", "return", "let", "const", "class", "pub",
    "static", "void", "int", "str", "impl", "use", "mod", "match", "if",
    "else", "for", "while", "true", "false", "none", "null",
]

_STEMS = [
    "parse", "config", "token", "index", "query", "build", "merge", "split",
    "encode", "decode", "read", "write", "batch", "stream", "shard", "block",
    "cache", "hash", "sort", "scan", "filter", "map", "reduce", "join",
    "segment", "normal", "score", "rank", "fetch", "store", "load", "dump",
    "async", "sync", "worker", "pool", "task", "graph", "node", "edge",
]

_NONLATIN_COMMENTS = [
    "人人生而自由，在尊严和权利上一律平等。",
    "Η γρήγορη καφέ αλεπού",
    "السلام عليكم كيف حالكم",
    "ภาษาไทยง่ายนิดเดียว",
]

_EXT_LANG = [
    ("py", "python"), ("rs", "rust"), ("js", "javascript"),
    ("java", "java"), ("go", "go"), ("md", "markdown"),
]


def _identifiers(rng: np.random.Generator, n: int) -> list[str]:
    a = rng.choice(_STEMS, size=n)
    b = rng.choice(_STEMS, size=n)
    style = rng.integers(0, 3, size=n)
    out = []
    for x, y, s in zip(a, b, style):
        if s == 0:
            out.append(f"{x}_{y}")  # snake_case
        elif s == 1:
            out.append(x + y.capitalize())  # camelCase
        else:
            out.append(x.capitalize() + y.capitalize())  # PascalCase
    return out


def generate_corpus(n_rows: int, seed: int = 42, offset: int = 0):
    """Returns a pandas DataFrame with the corpus schema. `offset` shifts the
    row indices (globally unique repo/path across chunks) AND the RNG stream
    — without the latter, same-seed chunks would emit byte-identical content
    (100% cross-chunk duplicates). offset=0 keeps the historical seed-only
    stream, so all existing fixtures are unchanged."""
    import pandas as pd

    rng = np.random.default_rng(seed if offset == 0 else (seed, offset))
    i = np.arange(offset, offset + n_rows)
    repos = [f"org{x % 7}/repo{x % 41}" for x in i]
    exts = rng.integers(0, len(_EXT_LANG), size=n_rows)
    paths = [
        f"src/module_{int(rng.integers(0, 30))}/file_{x}.{_EXT_LANG[e][0]}"
        for x, e in zip(i, exts)
    ]
    langs = [_EXT_LANG[e][1] for e in exts]
    commits = [
        hashlib.sha1(f"{r}/{p}".encode()).hexdigest() for r, p in zip(repos, paths)
    ]
    contents = []
    # Zipfian keyword sampling
    kw_probs = 1.0 / np.arange(1, len(_KEYWORDS) + 1)
    kw_probs /= kw_probs.sum()
    for x in range(n_rows):
        n_lines = int(rng.integers(3, 25))
        idents = _identifiers(rng, max(n_lines, 4))
        # doc-scoped rare identifiers widen the vocabulary (realistic code has
        # a long Zipf tail, which exercises bucket pruning + varint gaps)
        rare = f"sym{int(rng.integers(0, 99991))}"
        lines = []
        for ln in range(n_lines):
            kws = rng.choice(_KEYWORDS, size=rng.integers(1, 4), p=kw_probs)
            a, b = idents[ln % len(idents)], idents[(ln * 7 + 1) % len(idents)]
            tmpl = int(rng.integers(0, 4))
            if tmpl == 0:
                lines.append(f"{' '.join(kws)} {a}({b}: int) -> str:")
            elif tmpl == 1:
                lines.append(f"    {kws[0]} {a} = {b}.{kws[-1]}({rare})")
            elif tmpl == 2:
                lines.append(f"{kws[0]} {a} {{ {b}: \"literal_{ln}\" }}")
            else:
                lines.append(f"# {kws[0]} comment about {a} and {b}")
        if rng.random() < 0.04:  # ~4% of files get a non-Latin comment line
            lines.append("# " + _NONLATIN_COMMENTS[int(rng.integers(0, len(_NONLATIN_COMMENTS)))])
        contents.append("\n".join(lines))
    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def corpus_spark_df(spark, n_rows: int, seed: int = 42, partitions: int = 8):
    pdf = generate_corpus(n_rows, seed)
    return spark.createDataFrame(pdf).repartition(partitions)
