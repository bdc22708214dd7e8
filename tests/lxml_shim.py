"""Test-only lxml shim backed by stdlib ElementTree.

The reference extractor (/root/reference, read-only) imports ``lxml``,
which is not installed in this sandbox. To use the reference as an
*executable oracle* for golden generation, this module installs a fake
``lxml.etree`` into ``sys.modules`` implementing exactly the XPath
subset the reference uses (see SURVEY.md §2.9):

- descendant/child chains ``//a//b/c``, relative ``./a``, ``.//a``
- wildcard ``*``, namespace prefix ``tei:``
- predicates ``[@attr='val']``, ``[not(self::tei:label)]``
- unions ``a|b``
- the axis ``preceding::tei:pb[1]``
- element API: ``tag get attrib itertext getparent xpath``

This shim is used ONLY by tests/golden generation, never by the
engine. Its correctness is itself asserted by running the reference's
own parser tests through it (tests/test_reference_oracle.py).
"""

from __future__ import annotations

import re
import sys
import types
from typing import Dict, List, Optional
from xml.etree import ElementTree as _ET

_NSMAP_DEFAULT = {"tei": "http://www.tei-c.org/ns/1.0"}


class _Tree:
    def __init__(self, root_et: _ET.Element):
        self.root_et = root_et
        self.parent: Dict[int, _ET.Element] = {}
        self.order: Dict[int, int] = {}
        self._wrappers: Dict[int, "ShimElement"] = {}
        self.doc_order: List[_ET.Element] = []
        for i, el in enumerate(root_et.iter()):
            self.order[id(el)] = i
            self.doc_order.append(el)
            for c in el:
                self.parent[id(c)] = el

    def wrap(self, et_el: Optional[_ET.Element]) -> Optional["ShimElement"]:
        if et_el is None:
            return None
        w = self._wrappers.get(id(et_el))
        if w is None:
            w = ShimElement(et_el, self)
            self._wrappers[id(et_el)] = w
        return w


_STEP_RE = re.compile(r"(\.?//|\./|/|^)([^/\[\]|]+)((?:\[[^\]]*\])*)")
_PRED_RE = re.compile(r"\[([^\]]*)\]")


def _resolve_tag(test: str, nsmap: Dict[str, str]) -> str:
    if test == "*":
        return "*"
    if ":" in test:
        pfx, local = test.split(":", 1)
        return "{%s}%s" % (nsmap[pfx], local)
    return test


def _parse_path(path: str, nsmap: Dict[str, str]):
    """Parse one (non-union) path into [(axis, tag, [preds])]."""
    path = path.strip()
    steps = []
    pos = 0
    first = True
    while pos < len(path):
        m = _STEP_RE.match(path, pos)
        if not m:
            raise ValueError(f"unsupported xpath: {path!r} at {pos}")
        sep, test, predstr = m.group(1), m.group(2).strip(), m.group(3)
        pos = m.end()
        if sep in ("//", ".//") or (first and sep == "" and path.startswith("//")):
            axis = "desc"
        elif sep in ("./", "/", ""):
            axis = "child"
        else:
            axis = "child"
        # special axis prefix e.g. preceding::tei:pb
        if "::" in test:
            ax, test = test.split("::", 1)
            axis = ax
        preds = _PRED_RE.findall(predstr or "")
        steps.append((axis, test, preds))
        first = False
    return steps


def _match_pred(tree: _Tree, el: _ET.Element, pred: str, nsmap) -> bool:
    pred = pred.strip()
    m = re.fullmatch(r"@([\w:]+)\s*=\s*'([^']*)'", pred)
    if m:
        attr, val = m.group(1), m.group(2)
        if attr == "xml:id":
            attr = "{http://www.w3.org/XML/1998/namespace}id"
        elif ":" in attr:
            pfx, local = attr.split(":", 1)
            attr = "{%s}%s" % (nsmap[pfx], local)
        return el.get(attr) == val
    m = re.fullmatch(r"not\(self::([\w:]+)\)", pred)
    if m:
        return el.tag != _resolve_tag(m.group(1), nsmap)
    m = re.fullmatch(r"\d+", pred)
    if m:
        # positional predicates are handled by the caller
        return True
    raise ValueError(f"unsupported predicate: {pred!r}")


def _eval_path(tree: _Tree, ctx: _ET.Element, path: str, nsmap) -> List[_ET.Element]:
    steps = _parse_path(path, nsmap)
    nodes: List[_ET.Element] = [ctx]
    for axis, test, preds in steps:
        tag = _resolve_tag(test, nsmap)
        nxt: List[_ET.Element] = []
        seen = set()

        def add(e):
            if id(e) not in seen:
                seen.add(id(e))
                nxt.append(e)

        for n in nodes:
            if axis == "child":
                for c in n:
                    if tag == "*" or c.tag == tag:
                        add(c)
            elif axis == "desc":
                for c in n.iter():
                    if c is n:
                        continue
                    if tag == "*" or c.tag == tag:
                        add(c)
            elif axis == "preceding":
                limit = tree.order[id(n)]
                # ancestors are excluded from the preceding axis
                ancestors = set()
                a = tree.parent.get(id(n))
                while a is not None:
                    ancestors.add(id(a))
                    a = tree.parent.get(id(a))
                for c in tree.doc_order[:limit]:
                    if id(c) in ancestors:
                        continue
                    if tag == "*" or c.tag == tag:
                        add(c)
                nxt.sort(key=lambda e: tree.order[id(e)], reverse=True)
            else:
                raise ValueError(f"unsupported axis: {axis}")
        # predicates
        out = nxt
        for pred in preds:
            if re.fullmatch(r"\d+", pred.strip()):
                k = int(pred)
                out = [out[k - 1]] if len(out) >= k else []
            else:
                out = [e for e in out if _match_pred(tree, e, pred, nsmap)]
        if axis == "preceding":
            nodes = out
        else:
            nodes = sorted(out, key=lambda e: tree.order[id(e)])
    return nodes


class ShimElement:
    def __init__(self, et_el: _ET.Element, tree: _Tree):
        self._el = et_el
        self._tree = tree

    @property
    def tag(self):
        return self._el.tag

    @property
    def attrib(self):
        return self._el.attrib

    def get(self, key, default=None):
        return self._el.get(key, default)

    def itertext(self):
        return self._el.itertext()

    def getparent(self):
        return self._tree.wrap(self._tree.parent.get(id(self._el)))

    def xpath(self, path: str, namespaces=None):
        nsmap = namespaces or _NSMAP_DEFAULT
        results: List[_ET.Element] = []
        seen = set()
        for sub in path.split("|"):
            for e in _eval_path(self._tree, self._el, sub, nsmap):
                if id(e) not in seen:
                    seen.add(id(e))
                    results.append(e)
        results.sort(key=lambda e: self._tree.order[id(e)])
        return [self._tree.wrap(e) for e in results]

    def __iter__(self):
        for c in self._el:
            yield self._tree.wrap(c)

    def __len__(self):
        return len(self._el)


def fromstring(data) -> ShimElement:
    if isinstance(data, bytes):
        root = _ET.fromstring(data)
    else:
        root = _ET.fromstring(data)
    tree = _Tree(root)
    return tree.wrap(root)


class _ParsedTree:
    def __init__(self, root: ShimElement):
        self._root = root

    def getroot(self) -> ShimElement:
        return self._root


def parse(path) -> _ParsedTree:
    with open(path, "rb") as f:
        return _ParsedTree(fromstring(f.read()))


def install() -> None:
    """Register the fake ``lxml``/``lxml.etree`` modules."""
    if "lxml" in sys.modules and getattr(sys.modules["lxml"], "__shim__", False):
        return
    etree_mod = types.ModuleType("lxml.etree")
    etree_mod.fromstring = fromstring
    etree_mod.parse = parse
    etree_mod._Element = ShimElement
    etree_mod.XMLSyntaxError = _ET.ParseError
    lxml_mod = types.ModuleType("lxml")
    lxml_mod.etree = etree_mod
    lxml_mod.__shim__ = True
    sys.modules["lxml"] = lxml_mod
    sys.modules["lxml.etree"] = etree_mod
