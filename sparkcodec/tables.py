"""Deterministic synthetic ``code_files`` table (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
``repo string, path string, commit string, lang string, content string``.

Distributions are chosen to exercise every codec route:
- ``repo``  — Zipf-skewed, one giant repo holding ~30% of rows (skew/salting)
- ``path``  — hierarchical, heavy shared prefixes, sorted within repo
- ``commit``— 40-hex, small per-repo pool, repeats in runs
- ``lang``  — ~12 values correlated with extension (lowest cardinality)
- ``content``— templated source code per lang, lognormal lengths, with
  non-ASCII, empty strings, and a few very large files

Everything derives from a fixed seed — no wall clock, mirroring the
reference's generated-then-golden-compared fixtures
(tests/test_integration.py:39-47 in /root/reference).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

LANGS = {
    "python": ".py",
    "javascript": ".js",
    "typescript": ".ts",
    "rust": ".rs",
    "go": ".go",
    "c": ".c",
    "cpp": ".cpp",
    "java": ".java",
    "ruby": ".rb",
    "shell": ".sh",
    "markdown": ".md",
    "yaml": ".yaml",
}

_SNIPPETS = {
    "python": [
        "import os\nimport sys\nfrom typing import Optional, List\n\n",
        "def {f}({a}, {b}=None):\n    \"\"\"Process {a} into the result map.\"\"\"\n    out = {{}}\n    for item in {a}:\n        out[item.key] = item.value * 2\n    return out\n\n",
        "class {C}:\n    def __init__(self, {a}):\n        self.{a} = {a}\n        self._cache = {{}}\n\n    def get(self, key, default=None):\n        return self._cache.get(key, default)\n\n",
        "    if {a} is None:\n        raise ValueError(f'missing {a}: {{{a}!r}}')\n",
        "# TODO: handle the edge case where {a} overflows\nresult = [x for x in {a} if x is not None]\n",
        "with open('{a}.json') as fh:\n    config = json.load(fh)\n",
    ],
    "javascript": [
        "const {a} = require('./{b}');\n\n",
        "export function {f}({a}, {b}) {{\n  const out = [];\n  for (const item of {a}) {{\n    out.push(item * {b});\n  }}\n  return out;\n}}\n\n",
        "const {C} = {{\n  name: '{a}',\n  async init() {{\n    this.ready = true;\n  }},\n}};\n\n",
        "if (!{a}) throw new Error('missing {a}');\n",
    ],
    "rust": [
        "use std::collections::HashMap;\nuse std::sync::Arc;\n\n",
        "pub fn {f}({a}: &[u64], {b}: usize) -> Vec<u64> {{\n    {a}.iter().map(|x| x * {b} as u64).collect()\n}}\n\n",
        "#[derive(Debug, Clone)]\npub struct {C} {{\n    pub {a}: String,\n    pub {b}: u64,\n}}\n\n",
        "    let mut {a} = HashMap::new();\n    {a}.insert(\"key\", 42);\n",
    ],
    "c": [
        "#include <stdio.h>\n#include <stdlib.h>\n\n",
        "static int {f}(const int *{a}, size_t n) {{\n    int acc = 0;\n    for (size_t i = 0; i < n; i++) acc += {a}[i];\n    return acc;\n}}\n\n",
        "typedef struct {{\n    uint32_t {a};\n    uint64_t {b};\n}} {C};\n\n",
    ],
    "markdown": [
        "# {C}\n\nThis module implements the {a} pipeline.\n\n",
        "## Usage\n\n```bash\n./run --input {a} --output {b}\n```\n\n",
        "- `{a}` — the primary input\n- `{b}` — optional override\n\n",
    ],
    "yaml": [
        "name: {a}\nversion: 1.{b}\n",
        "jobs:\n  {a}:\n    runs-on: ubuntu-latest\n    steps:\n      - uses: actions/checkout@v4\n",
        "{a}:\n  enabled: true\n  limit: {b}\n",
    ],
}
# languages without their own pool borrow a related one
_POOL_OF = {
    "typescript": "javascript",
    "go": "c",
    "cpp": "c",
    "java": "javascript",
    "ruby": "python",
    "shell": "yaml",
}

_IDENTS = [
    "data", "items", "config", "buffer", "index", "stream", "values",
    "nodes", "edges", "batch", "chunk", "offset", "table", "schema",
    "réseau", "données",  # non-ASCII identifiers (UTF-8 multibyte)
]
_CLASSES = ["Processor", "Manager", "Builder", "Codec", "Reader", "Writer", "Índice"]
_FUNCS = ["process", "convert", "encode", "decode", "merge", "split", "validar"]

_DIRS = ["src", "lib", "core", "utils", "internal", "pkg", "tests", "docs"]


def _make_content(rng: np.random.Generator, lang: str, target_len: int) -> str:
    pool = _SNIPPETS.get(lang) or _SNIPPETS[_POOL_OF.get(lang, "python")]
    parts: list[str] = []
    size = 0
    while size < target_len:
        t = pool[int(rng.integers(len(pool)))]
        s = t.format(
            a=_IDENTS[int(rng.integers(len(_IDENTS)))],
            b=_IDENTS[int(rng.integers(len(_IDENTS)))],
            f=_FUNCS[int(rng.integers(len(_FUNCS)))],
            C=_CLASSES[int(rng.integers(len(_CLASSES)))],
        )
        parts.append(s)
        size += len(s)
    return "".join(parts)


def code_files_arrow(n_rows: int, seed: int = 42, n_repos: int = 50) -> pa.Table:
    """Build the synthetic table as one Arrow table (deterministic)."""
    rng = np.random.default_rng(seed)
    langs = list(LANGS)

    # Zipf-ish repo sizes with repo 0 pinned to ~30% of all rows
    weights = 1.0 / np.arange(1, n_repos + 1) ** 1.3
    weights[0] = 0.0
    weights = weights / weights.sum() * 0.7
    weights[0] = 0.3
    rows_per_repo = rng.multinomial(n_rows, weights)

    repo_col, path_col, commit_col, lang_col, content_col = [], [], [], [], []
    for r in range(n_repos):
        nr = int(rows_per_repo[r])
        if nr == 0:
            continue
        repo = f"org{r % 7}/repo-{r:03d}"
        commit_pool = [
            "".join(rng.choice(list("0123456789abcdef"), 40)) for _ in range(20)
        ]
        # each repo leans on 2-4 main languages
        repo_langs = rng.choice(langs, size=int(rng.integers(2, 5)), replace=False)
        lang_of_row = rng.choice(repo_langs, size=nr)
        # hierarchical paths, generated sorted within repo
        d1 = rng.choice(_DIRS, size=nr)
        d2 = rng.integers(0, max(2, nr // 40) + 2, size=nr)
        fid = rng.integers(0, 10**6, size=nr)
        paths = [
            f"{d1[i]}/module_{d2[i]:03d}/file_{fid[i]:06d}{LANGS[lang_of_row[i]]}"
            for i in range(nr)
        ]
        order = np.argsort(paths)
        paths = [paths[i] for i in order]
        lang_of_row = lang_of_row[order]
        # commits arrive in runs (files committed together)
        run_lens = rng.geometric(1 / 8, size=nr)
        commit_idx = np.repeat(
            rng.integers(0, 20, size=nr), run_lens
        )[:nr]
        if len(commit_idx) < nr:
            commit_idx = np.pad(commit_idx, (0, nr - len(commit_idx)), mode="edge")
        # content lengths: lognormal 200..20000, a few empty / very large
        lens = np.clip(rng.lognormal(7.0, 0.9, size=nr), 50, 20000).astype(int)
        lens[rng.random(nr) < 0.01] = 0
        big = rng.random(nr) < 0.002
        lens[big] = 200_000

        repo_col.extend([repo] * nr)
        path_col.extend(paths)
        commit_col.extend(commit_pool[i] for i in commit_idx)
        lang_col.extend(lang_of_row.tolist())
        content_col.extend(
            _make_content(rng, lang_of_row[i], int(lens[i])) if lens[i] else ""
            for i in range(nr)
        )

    return pa.table(
        {
            "repo": pa.array(repo_col, pa.string()),
            "path": pa.array(path_col, pa.string()),
            "commit": pa.array(commit_col, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
            "content": pa.array(content_col, pa.string()),
        }
    )


def write_code_files(
    path: str, n_rows: int, seed: int = 42, n_repos: int = 50, n_files: int = 16
) -> str:
    """Materialize the synthetic table as a parquet dataset directory.

    Multiple files so Spark's scan parallelizes like a real table layout
    would (one 28 MB file = one input split = a serial map stage).
    """
    import pyarrow.parquet as pq

    t = code_files_arrow(n_rows, seed=seed, n_repos=n_repos)
    os.makedirs(path, exist_ok=True)
    n = t.num_rows
    step = max(1, (n + n_files - 1) // n_files)
    for i in range(0, n_files):
        sl = t.slice(i * step, step)
        if sl.num_rows == 0:
            break
        pq.write_table(sl, os.path.join(path, f"part-{i:04d}.parquet"), compression="snappy")
    return path


def code_files_df(spark, n_rows: int, seed: int = 42, n_repos: int = 50):
    """Synthetic table as a Spark DataFrame (Arrow-path createDataFrame)."""
    t = code_files_arrow(n_rows, seed=seed, n_repos=n_repos)
    return spark.createDataFrame(t.to_pandas())
