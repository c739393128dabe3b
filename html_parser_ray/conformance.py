"""Tree-construction conformance harness (html5lib ``.dat`` format).

Re-implements the reference's external-suite criterion
(ref: tools/scripts.zig:1791-1860 ``parseHtml5libDat``, :1994-2062
``runParserCases``): a case passes when the engine's **element tag-name
preorder sequence** equals the expected tree's element sequence, with wrapper
tags (html, head, body, tbody, tr — ref: scripts.zig:1803-1809) filtered on
BOTH sides (spec parsers auto-insert them; a permissive parser doesn't).
Foreign-content payloads (``<svg x>`` / ``<math x>``) take the second token
(ref: scripts.zig:1791-1801).

The vendored corpus under tests/data/ is hand-authored in the html5lib-tests
format from the published spec semantics (no network in this environment to
fetch the upstream suites); expected trees are the SPEC parser's trees, so
cases our permissive engine cannot reproduce (adoption agency, foster
parenting, ``</br>``/``<image>`` rewrites) fail honestly — the same failure
profile the reference reports (524/600, 440/500; README.md:37).
"""

from __future__ import annotations

from dataclasses import dataclass

WRAPPER_TAGS = frozenset(("html", "head", "body", "tbody", "tr"))


@dataclass
class DatCase:
    html: str
    expected: list[str]  # lowercase element tags, wrappers filtered
    index: int


def _tree_line_tag(payload: str) -> str | None:
    """Tag from a ``| <...>`` tree-line payload (ref: scripts.zig:1791-1801):
    first whitespace token, except foreign content where ``svg``/``math`` is a
    namespace prefix and the element name is the second token. Comment /
    doctype / bogus lines (``!``, ``?``, ``/`` payloads) are NOT elements
    (scripts.zig:1794 — round 3 fixed a criterion divergence here: the round-2
    harness counted them, the reference's does not)."""
    payload = payload.strip(" \t\r\n")
    if not payload or payload[0] in "!?/":
        return None
    parts = payload.split()
    if not parts:
        return None
    first = parts[0]
    if first in ("svg", "math"):
        return parts[1] if len(parts) > 1 else first
    return first


def parse_dat(text: str) -> list[DatCase]:
    """Parse an html5lib-tests ``.dat`` file into runnable cases
    (document-fragment cases skipped, ref: scripts.zig:1828)."""
    cases: list[DatCase] = []
    blocks = text.split("\n#data\n")
    for raw in blocks:
        blk = raw
        if blk.startswith("#data\n"):
            blk = blk[len("#data\n") :]
        if "#document" not in blk:
            continue
        doc_idx = blk.find("\n#document\n")
        if doc_idx < 0:
            continue
        data_part = blk[:doc_idx]
        rest = blk[doc_idx + len("\n#document\n") :]
        if "\n#document-fragment\n" in data_part or "\n#document-fragment\n" in rest:
            continue
        html_in = data_part
        # cut the error section; an EMPTY one leaves data_part ending in
        # "\n#errors" with no trailing newline (the reference harness misses
        # that shape because upstream files always carry error lines)
        err_idx = html_in.find("\n#errors\n")
        if err_idx < 0 and html_in.endswith("\n#errors"):
            err_idx = len(html_in) - len("\n#errors")
        if err_idx >= 0:
            html_in = html_in[:err_idx]
        expected: list[str] = []
        for line in rest.split("\n"):
            if len(line) < 3 or line[0] != "|":
                continue
            j = 1
            while j < len(line) and line[j] in " \t":
                j += 1
            if j >= len(line) or line[j] != "<":
                continue
            if line[-1] != ">":
                continue
            payload = line[j + 1 : -1]
            tag = _tree_line_tag(payload)
            if tag is None:
                continue
            lower = tag.lower()
            if lower in WRAPPER_TAGS:
                continue
            expected.append(lower)
        cases.append(DatCase(html=html_in, expected=expected, index=len(cases)))
    return cases


def engine_tag_sequence(html: str) -> list[str]:
    """Element tag names in preorder from this engine, wrapper-filtered
    (the Python analog of suite_runner parse-tags-file +
    parseTagJsonArray's filter, ref: suite_runner.zig:134-158,
    scripts.zig:1966-1985)."""
    from html_parser_ray.html.document import parse_html
    from html_parser_ray.html.tokenizer import KIND_ELEMENT

    doc = parse_html(html.encode("utf-8"))
    out: list[str] = []
    for i in range(len(doc.kind)):
        if doc.kind[i] != KIND_ELEMENT:
            continue
        name = (doc.name[i] or b"").decode("utf-8", "replace")
        if name in WRAPPER_TAGS:
            continue
        out.append(name)
    return out


@dataclass
class SuiteResult:
    total: int
    passed: int
    failures: list[tuple[int, str, list[str], list[str]]]  # idx, html, exp, got

    @property
    def failed(self) -> int:
        return self.total - self.passed


def run_cases(cases: list[DatCase], max_cases: int | None = None) -> SuiteResult:
    limit = min(max_cases, len(cases)) if max_cases else len(cases)
    passed = 0
    failures: list[tuple[int, str, list[str], list[str]]] = []
    for c in cases[:limit]:
        try:
            got = engine_tag_sequence(c.html)
        except Exception:
            got = ["<parse-error>"]
        if got == c.expected:
            passed += 1
        else:
            failures.append((c.index, c.html, c.expected, got))
    return SuiteResult(total=limit, passed=passed, failures=failures)


def run_dat_file(path: str, max_cases: int | None = None) -> SuiteResult:
    with open(path, encoding="utf-8") as f:
        return run_cases(parse_dat(f.read()), max_cases)
