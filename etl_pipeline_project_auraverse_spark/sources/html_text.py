"""Pure-stdlib HTML tag extraction (S9 backend).

The reference walks BeautifulSoup's parse tree — every element in
document order, ``get_text(strip=True)`` per element, one row per tag
with > 3 chars of text plus ``_html_attr_*`` columns (reference
``backend/etl_pipeline.py:141-148``). bs4 is not in this container, so
this module builds an equivalent element tree with
``html.parser.HTMLParser`` (the same tokenizer bs4's ``html.parser``
builder uses) and reproduces the semantics that matter:

- ``find_all(True)`` order = pre-order document order;
- ``get_text(strip=True)`` = every descendant text node stripped,
  empties dropped, concatenated with no separator;
- multi-valued attributes (``class``, ``rel``, ``headers``,
  ``accesskey``) become Python lists whose ``str()`` matches bs4's
  (the reference stringifies attrs with ``str(val)``);
- unclosed / misnested tags are tolerated: an end tag closes the
  nearest matching open element, unknown end tags are ignored, and
  void elements (br, img, ...) never take children.

Known divergence from bs4 (documented, tested): bs4's html.parser
builder auto-closes ``<p>`` on a new block element; this parser only
closes on explicit end tags, so text after an unclosed ``<p>`` inside
a div attaches to the ``<p>`` rather than the div.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
MULTI_VALUED_ATTRS = frozenset(["class", "rel", "headers", "accesskey"])


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: list[tuple[str, str | None]]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node | str] = []


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]", [])
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        node = _Node(tag, attrs)
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.stack[-1].children.append(_Node(tag, attrs))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # no matching open element: ignore the stray end tag (bs4 does too)

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)


def _get_text_stripped(node: _Node) -> str:
    """bs4 ``get_text(strip=True)``: descendant strings stripped,
    empties dropped, joined with no separator."""
    parts: list[str] = []
    todo: list[_Node | str] = list(node.children)
    out: list[str] = []
    while todo:
        item = todo.pop(0)
        if isinstance(item, str):
            s = item.strip()
            if s:
                out.append(s)
        else:
            todo[0:0] = item.children
    del parts
    return "".join(out)


def _attr_value(name: str, value: str | None) -> object:
    """bs4 attribute shaping: multi-valued attrs split into lists."""
    if value is None:
        value = ""
    if name in MULTI_VALUED_ATTRS:
        return value.split()
    return value


def iter_tag_rows(html: str, min_text_len: int = 3) -> list[dict[str, str]]:
    """One row per element with stripped text longer than
    ``min_text_len`` chars: ``{_html_tag, _html_text, _html_attr_*}``
    — the reference's per-tag extraction, attrs stringified."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    rows: list[dict[str, str]] = []
    todo: list[_Node | str] = list(builder.root.children)
    while todo:
        item = todo.pop(0)
        if isinstance(item, str):
            continue
        text = _get_text_stripped(item)
        if text and len(text) > min_text_len:
            row: dict[str, str] = {"_html_tag": item.tag, "_html_text": text}
            for name, value in item.attrs:
                row[f"_html_attr_{name}"] = str(_attr_value(name, value))
            rows.append(row)
        todo[0:0] = item.children  # pre-order: children before siblings' rest
    return rows
