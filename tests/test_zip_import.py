"""The north rule's execution mode ships the package to executors as a
--py-files ZIP. Everything that reads shipped package data must therefore
work under zipimport — and the tokenizer fingerprint must be IDENTICAL to
the filesystem value, or every fingerprint-stamped artifact built locally
would be refused by a cluster-built reader (and vice versa).

Regression: config._shipped_data_digest used os.listdir(dirname(__file__))
and died with NotADirectoryError inside a zip, killing every spark-submit
--py-files run at the first tokenize."""

import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _build_zip(tmp_path) -> str:
    zpath = tmp_path / "sparkft_pkg.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "sparkft").rglob("*")):
            if p.is_file() and "__pycache__" not in p.parts:
                z.write(p, p.relative_to(REPO))
    return str(zpath)


def test_fingerprint_and_tokenize_from_zip_only(tmp_path):
    zpath = _build_zip(tmp_path)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        # refuse any fallback to the repo checkout: the zip must suffice
        "sys.path = [p for p in sys.path if p not in ('', %r)]\n"
        "from sparkft.config import tokenizer_fingerprint, DEFAULT_CONFIG\n"
        "from sparkft.tokenizer import tokenize_str\n"
        "import sparkft.config as c\n"
        "assert 'zip' in c.__file__, c.__file__\n"
        "print(tokenizer_fingerprint(DEFAULT_CONFIG))\n"
        "print(' '.join(t.lemma for t in tokenize_str('Hello WorldWide 中文')"
        " if t.kind == 'word'))\n"
    ) % str(REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, zpath],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    zip_fp, zip_toks = out.stdout.strip().splitlines()[-2:]

    from sparkft.config import DEFAULT_CONFIG, tokenizer_fingerprint
    from sparkft.tokenizer import tokenize_str

    assert zip_fp == tokenizer_fingerprint(DEFAULT_CONFIG)
    fs_toks = " ".join(t.lemma for t in tokenize_str("Hello WorldWide 中文")
                       if t.kind == "word")
    assert zip_toks == fs_toks
