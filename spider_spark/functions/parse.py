"""Vectorized HTML parse kernel (hard item H2).

Reproduces the reference's parse semantics (crawler.py:157-172) without
bs4/lxml (absent offline): for each page we extract

* ``title`` — text of the **first** ``<title>`` element (``soup.title``),
  then ``.replace('\\n', '').strip()`` applied only when truthy
  (crawler.py:165-168); pages without a title yield NULL, mirroring
  ``getattr(title_html, 'text', None)``.
* ``hrefs`` — the ``href`` attribute of every ``<a>`` tag in document order
  (``soup.findAll('a')``, crawler.py:117); anchors without ``href`` are
  skipped (KeyError → continue, crawler.py:154-155).
* ``text`` — deterministic text extraction (all character data outside
  ``script``/``style``, segments stripped, joined with ``\\n``). The pages
  generator writes its ``text`` column with this same kernel, so the
  per-row invariant "byte-identical extracted text per url" is directly
  testable.

The per-row work is plain Python but runs inside Arrow-batched pandas UDFs
(``input_hint``: no per-row Python at the DataFrame API level); the parse is
CPU-bound string work that distributes linearly with partitions.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from spider_spark.functions.urlkit import CanonURL, generate_refs_with_host

PARSED_SCHEMA = StructType(
    [
        StructField("title", StringType(), True),
        StructField(
            "links",
            ArrayType(
                StructType(
                    [
                        StructField("url", StringType(), False),
                        StructField("host", StringType(), False),
                    ]
                )
            ),
            False,
        ),
        # nullable: the crawl's html_only MIME gate sends NULL html into
        # the kernel for binary payloads, which parse to text=NULL
        StructField("text", StringType(), True),
    ]
)

_SKIP_TEXT_TAGS = frozenset({"script", "style"})
_VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)


# rel tokens that opt a link out of endorsement (nofollow and its 2019
# refinements — search engines treat all three as "don't credit this")
_NOFOLLOW_RELS = frozenset({"nofollow", "ugc", "sponsored"})


def _rel_nofollow(attrs) -> bool:
    for name, value in attrs:
        if name == "rel":
            toks = (value or "").lower().split()
            return any(t in _NOFOLLOW_RELS for t in toks)
    return False


class _PageParser(HTMLParser):
    """One-pass extraction of (first-title, hrefs-in-order, text).
    ``href_nofollow`` rides 1:1 with ``hrefs`` (rel=nofollow/ugc/sponsored)
    so crawl admission can honor per-anchor opt-outs without a second
    parse; callers that ignore it pay one boolean append per anchor."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] | None = None
        self._in_first_title = False
        self._title_done = False
        self.hrefs: list[str] = []
        self.href_nofollow: list[bool] = []
        self.text_parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]):
        if tag == "a":
            for name, value in attrs:
                if name == "href":
                    self.hrefs.append(value or "")
                    self.href_nofollow.append(_rel_nofollow(attrs))
                    break
        elif tag == "title" and not self._title_done:
            self._in_first_title = True
            self.title_parts = []
        elif tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1

    def handle_startendtag(self, tag: str, attrs):
        if tag == "a":
            for name, value in attrs:
                if name == "href":
                    self.hrefs.append(value or "")
                    self.href_nofollow.append(_rel_nofollow(attrs))
                    break

    def handle_endtag(self, tag: str):
        if tag == "title" and self._in_first_title:
            self._in_first_title = False
            self._title_done = True
        elif tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str):
        if self._in_first_title:
            self.title_parts.append(data)
        if self._skip_depth == 0:
            seg = data.strip()
            if seg:
                self.text_parts.append(seg)


def _feed_parser(html: bytes | str, parser_cls=_PageParser):
    """Decode + feed one page through a parser class; malformed tails keep
    whatever was extracted so far."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = parser_cls()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # malformed tail: keep what was extracted so far
    return p


def _title_of(p: _PageParser) -> str | None:
    title = "".join(p.title_parts) if p.title_parts is not None else None
    if title:  # truthy-only transform, crawler.py:166-168
        title = title.replace("\n", "").strip()
    return title


def parse_page(html: bytes | str) -> tuple[str | None, list[str], str]:
    """Parse one page → (title, raw hrefs in document order, text)."""
    p = _feed_parser(html)
    return _title_of(p), p.hrefs, "\n".join(p.text_parts)


def parse_page_rel(
    html: bytes | str,
) -> tuple[str | None, list[str], list[bool], str]:
    """:func:`parse_page` plus the per-anchor nofollow flags (rel carries
    nofollow/ugc/sponsored), aligned 1:1 with the hrefs list. Title and
    text are byte-identical to :func:`parse_page`'s — the rel attribute
    never influences extraction."""
    p = _feed_parser(html)
    return _title_of(p), p.hrefs, p.href_nofollow, "\n".join(p.text_parts)


def extract_text(html: bytes | str) -> str:
    """The deterministic text kernel alone (pages-generator + invariant)."""
    return parse_page(html)[2]


# ---------------------------------------------------------------------------
# Arrow-batched UDFs
# ---------------------------------------------------------------------------


def make_parse_udf(resolve_base: str = "seed", honor_nofollow: bool = False):
    """Pandas UDF ``(html:binary, seed_url:string[, page_url:string]) ->
    struct<title,links,text>`` with the link pipeline (query-string filter,
    relative resolution, self-link drop — crawler.py:140-155) applied in
    document order.

    ``resolve_base='seed'`` replicates quirk Q1 (relative hrefs resolve
    against the crawl seed, crawler.py:150-151 — ``self.url`` is the seed,
    set once at crawler.py:53); ``'page'`` is the corrected mode and takes
    the page's own URL as a third column. The seed travels as a column so
    one crawl run can serve a multi-seed frontier; parsed seeds are memoized
    per Arrow batch (a batch typically holds one or a handful of seeds).

    ``honor_nofollow=True`` drops anchors whose ``rel`` carries
    nofollow/ugc/sponsored BEFORE resolution — the per-anchor admission
    opt-out a polite crawler honors. Title and extracted text are
    byte-identical across both modes (the invariant never depends on rel).
    """

    def _run(html: pd.Series, seed_url: pd.Series, base_url: pd.Series) -> pd.DataFrame:
        memo: dict[str, CanonURL] = {}

        def cu(s: str) -> CanonURL:
            got = memo.get(s)
            if got is None:
                got = memo[s] = CanonURL.parse(s)
            return got

        titles, links, texts = [], [], []
        for h, su, bu in zip(html, seed_url, base_url):
            if h is None:
                # NULL html = "don't parse me" (the crawl's html_only MIME
                # gate nulls non-HTML payloads before the Arrow transfer,
                # so binaries never even cross into Python)
                titles.append(None)
                links.append([])
                texts.append(None)
                continue
            if honor_nofollow:
                t, hrefs, nf, txt = parse_page_rel(h)
                hrefs = [href for href, drop in zip(hrefs, nf) if not drop]
            else:
                t, hrefs, txt = parse_page(h)
            titles.append(t)
            links.append(generate_refs_with_host(hrefs, cu(su), resolve_base=cu(bu)))
            texts.append(txt)
        return pd.DataFrame({"title": titles, "links": links, "text": texts})

    if resolve_base == "seed":

        @pandas_udf(PARSED_SCHEMA)
        def parse_html(html: pd.Series, seed_url: pd.Series) -> pd.DataFrame:
            return _run(html, seed_url, seed_url)

        return parse_html

    @pandas_udf(PARSED_SCHEMA)
    def parse_html_pagebase(
        html: pd.Series, seed_url: pd.Series, page_url: pd.Series
    ) -> pd.DataFrame:
        return _run(html, seed_url, page_url)

    return parse_html_pagebase


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


# ---------------------------------------------------------------------------
# boilerplate removal (main-content extraction)
# ---------------------------------------------------------------------------

_BOILERPLATE_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "form", "menu"}
)
_MIN_SEGMENT_CHARS = 30
_SENTENCE_PUNCT = (".", "!", "?", ":", ";")


class _MainContentParser(_PageParser):
    """The page parser plus a boilerplate-container stack: character data
    inside nav/header/footer/aside/form/menu is tagged so the main-content
    filter can drop it (the jusText/trafilatura family's structural rule,
    reduced to its deterministic core)."""

    def __init__(self) -> None:
        super().__init__()
        self._boiler_depth = 0
        self.segment_flags: list[bool] = []  # True = inside boilerplate

    def handle_starttag(self, tag, attrs):
        super().handle_starttag(tag, attrs)
        if tag in _BOILERPLATE_TAGS:
            self._boiler_depth += 1

    def handle_endtag(self, tag):
        super().handle_endtag(tag)
        if tag in _BOILERPLATE_TAGS and self._boiler_depth > 0:
            self._boiler_depth -= 1

    def handle_data(self, data):
        before = len(self.text_parts)
        super().handle_data(data)
        if len(self.text_parts) > before:
            self.segment_flags.append(self._boiler_depth > 0)


def extract_main_text(html: bytes | str) -> str:
    """Main-content text: the page's text segments minus (a) anything
    inside a structural boilerplate container and (b) short fragments
    with no sentence punctuation (menu items, button labels). The
    deterministic core of density-based boilerplate removal — kept
    rule-exact so it is testable and reproducible across runs."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _MainContentParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    kept = [
        seg
        for seg, boiler in zip(p.text_parts, p.segment_flags)
        if not boiler
        and (len(seg) >= _MIN_SEGMENT_CHARS
             or any(ch in seg for ch in _SENTENCE_PUNCT))
    ]
    return "\n".join(kept)


@pandas_udf(StringType())
def extract_main_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_main_text)


# ---------------------------------------------------------------------------
# anchor-text extraction (web-IR link signal)
# ---------------------------------------------------------------------------

ANCHORS_SCHEMA = ArrayType(
    StructType(
        [
            StructField("url", StringType(), False),
            StructField("host", StringType(), False),
            StructField("anchor_text", StringType(), False),
            StructField("nofollow", BooleanType(), False),
        ]
    )
)

class _AnchorParser(_PageParser):
    """The page parser plus anchor-text capture: character data between an
    ``<a href=...>`` and its ``</a>`` is collected per anchor, in document
    order, aligned 1:1 with ``hrefs``. A new ``<a>`` implicitly closes an
    open one (the browser recovery rule — nested anchors are invalid
    HTML), so a malformed page can't smear one link's text into the next."""

    def __init__(self) -> None:
        super().__init__()
        self.anchor_texts: list[list[str]] = []
        self.anchor_nofollow: list[bool] = []
        self._open_anchor: list[str] | None = None

    @staticmethod
    def _rel_nofollow(attrs) -> bool:
        return _rel_nofollow(attrs)

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._open_anchor = None  # implicit close of any open anchor
        n_hrefs = len(self.hrefs)
        super().handle_starttag(tag, attrs)
        if tag == "a" and len(self.hrefs) > n_hrefs:  # had an href
            self._open_anchor = []
            self.anchor_texts.append(self._open_anchor)
            self.anchor_nofollow.append(self._rel_nofollow(attrs))

    def handle_startendtag(self, tag, attrs):
        n_hrefs = len(self.hrefs)
        super().handle_startendtag(tag, attrs)
        if tag == "a" and len(self.hrefs) > n_hrefs:
            self.anchor_texts.append([])  # <a .../> carries no text
            self.anchor_nofollow.append(self._rel_nofollow(attrs))

    def handle_endtag(self, tag):
        super().handle_endtag(tag)
        if tag == "a":
            self._open_anchor = None

    def handle_data(self, data):
        super().handle_data(data)
        if self._open_anchor is not None:
            self._open_anchor.append(data)


def parse_anchors(
    html: bytes | str, page_url: str
) -> list[dict]:
    """Per-page anchor records ``{url, host, anchor_text}`` under the
    engine's link pipeline (query-string drop, relative resolution against
    the page, self-link drop — the crawl's admission filters, so the
    anchor index describes exactly the links a crawl would follow).
    ``anchor_text`` is the anchor's character data, whitespace-collapsed
    and stripped (empty for image-only / empty anchors); ``nofollow`` is
    True when the anchor's ``rel`` carries nofollow/ugc/sponsored (the
    link exists but endorses nothing)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _AnchorParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # malformed tail: keep what was extracted so far
    base = CanonURL.parse(page_url)
    page_s = str(base)
    out: list[dict] = []
    for href, parts, nf in zip(p.hrefs, p.anchor_texts, p.anchor_nofollow):
        u = CanonURL.parse(href)
        if u.query_string:
            continue
        if not u.is_absolute:
            u = base.join(href)
        s = str(u)
        if s == page_s:
            continue
        text = " ".join(" ".join(parts).split())
        out.append({"url": s, "host": u.host, "anchor_text": text,
                    "nofollow": nf})
    return out


@pandas_udf(ANCHORS_SCHEMA)
def extract_anchors_udf(html: pd.Series, page_url: pd.Series) -> pd.Series:
    return pd.Series(
        [parse_anchors(h, u) for h, u in zip(html, page_url)]
    )


# ---------------------------------------------------------------------------
# rel=canonical extraction (duplicate-URL consolidation signal)
# ---------------------------------------------------------------------------


class _CanonicalParser(HTMLParser):
    """Captures the FIRST ``<link rel=canonical href=...>`` in ``<head>``
    — per Google's documented handling, later canonical declarations are
    ignored and declarations outside the head don't count. ``rel`` is a
    space-separated token list, matched case-insensitively."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.canonical: str | None = None
        self._done = False

    def handle_starttag(self, tag, attrs):
        if self._done:
            return
        if tag == "body":
            self._done = True
            return
        if tag == "link" and self.canonical is None:
            d = dict(attrs)
            rel = (d.get("rel") or "").lower().split()
            href = d.get("href")
            if "canonical" in rel and href:
                self.canonical = href.strip()
                self._done = True

    def handle_endtag(self, tag):
        if tag == "head":
            self._done = True


def extract_canonical(html: bytes | str,
                      base_url: str | None = None) -> str | None:
    """The page's declared canonical URL (normalized absolute form), or
    None. A relative href resolves against ``base_url`` through the
    engine's own URL algebra (functions/urlkit.py CanonURL.join — the
    crawl's resolution rules, not a second implementation); a relative
    declaration with no base to resolve against is unusable → None."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _CanonicalParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    href = p.canonical
    if href is None:
        return None
    target = CanonURL.parse(href)
    if not target.is_absolute:
        if not base_url:
            return None
        target = CanonURL.parse(base_url).join(href)
    return str(target)


def make_canonical_udf():
    """(html, page_url) → canonical target (absolute) or NULL, one Arrow
    batch per partition — the input signal for canonical-URL dedup
    clustering (two URLs declaring the same canonical are one page)."""

    @pandas_udf(StringType())
    def canonical_udf(html: pd.Series, url: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_canonical(h, u) for h, u in zip(html, url)],
            dtype="object",
        )

    return canonical_udf


# ---------------------------------------------------------------------------
# meta robots directives (crawl-admission signal)
# ---------------------------------------------------------------------------


class _MetaRobotsParser(HTMLParser):
    """Collects every ``<meta name=robots content=...>`` in ``<head>``.
    Multiple tags combine MOST-RESTRICTIVE (documented search-engine
    handling); names and directive tokens are case-insensitive, tokens
    comma-separated with surrounding whitespace ignored."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.noindex = False
        self.nofollow = False
        self._done = False

    def _apply(self, content: str) -> None:
        for tok in content.lower().split(","):
            tok = tok.strip()
            if tok in ("noindex", "none"):
                self.noindex = True
            if tok in ("nofollow", "none"):
                self.nofollow = True

    def handle_starttag(self, tag, attrs):
        if self._done:
            return
        if tag == "body":
            self._done = True
            return
        if tag == "meta":
            d = dict(attrs)
            if (d.get("name") or "").strip().lower() == "robots":
                self._apply(d.get("content") or "")

    def handle_endtag(self, tag):
        if tag == "head":
            self._done = True


def extract_meta_robots(html: bytes | str) -> tuple[bool, bool]:
    """``(noindex, nofollow)`` from the page's head-scoped meta robots
    directives; absent/indifferent declarations yield (False, False).
    ``noindex`` pages must not enter the results/index tables;
    ``nofollow`` pages contribute no frontier links."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _MetaRobotsParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return (p.noindex, p.nofollow)


META_ROBOTS_SCHEMA = StructType(
    [
        StructField("noindex", BooleanType(), False),
        StructField("nofollow", BooleanType(), False),
    ]
)


def make_meta_robots_udf():
    """html → struct(noindex, nofollow), one Arrow batch per partition —
    the admission gate a crawl applies before indexing a page or
    expanding its links."""

    @pandas_udf(META_ROBOTS_SCHEMA)
    def meta_robots_udf(html: pd.Series) -> pd.DataFrame:
        vals = [extract_meta_robots(h) for h in html]
        return pd.DataFrame(vals, columns=["noindex", "nofollow"])

    return meta_robots_udf


# ---------------------------------------------------------------------------
# single-pass head audit (title + canonical + meta robots)
# ---------------------------------------------------------------------------


class _HeadAuditParser(HTMLParser):
    """ONE pass collecting every head signal the pipeline consumes:
    first ``<title>`` text, first-wins ``rel=canonical`` href, and
    most-restrictive meta-robots directives. Canonical/robots are
    head-scoped like the individual parsers; the title matches
    :func:`parse_page`'s first-title-ANYWHERE rule (the reference's
    ``soup.title``), so the fused kernel is a drop-in for all three —
    semantics identity is pinned by test."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] | None = None
        self._in_title = False
        self._title_done = False
        self.canonical: str | None = None
        self.noindex = False
        self.nofollow = False
        self.html_lang: str | None = None
        self._saw_html = False
        self._done = False

    def handle_starttag(self, tag, attrs):
        if tag == "title" and not self._title_done:
            self._in_title = True
            self.title_parts = []
            return
        if tag == "html" and not self._saw_html:
            self._saw_html = True
            self.html_lang = _lang_attr(attrs)
            return
        if self._done:
            return
        if tag == "body":
            self._done = True
        elif tag == "link" and self.canonical is None:
            d = dict(attrs)
            if "canonical" in (d.get("rel") or "").lower().split():
                href = d.get("href")
                if href:
                    self.canonical = href.strip()
        elif tag == "meta":
            d = dict(attrs)
            if (d.get("name") or "").strip().lower() == "robots":
                for tok in (d.get("content") or "").lower().split(","):
                    tok = tok.strip()
                    if tok in ("noindex", "none"):
                        self.noindex = True
                    if tok in ("nofollow", "none"):
                        self.nofollow = True

    def handle_endtag(self, tag):
        if tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True
        elif tag == "head":
            self._done = True

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)


def _lang_attr(attrs) -> str | None:
    """``lang``/``xml:lang`` attribute value, BCP-47-casually normalized
    (strip + lowercase — subtag case is display-only per RFC 5646);
    ``lang`` wins over ``xml:lang``; empty → None."""
    d = dict(attrs)
    raw = d.get("lang") or d.get("xml:lang") or ""
    raw = raw.strip().lower()
    return raw or None


class _HtmlLangParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.html_lang: str | None = None
        self.done = False

    def handle_starttag(self, tag, attrs):
        if tag == "html" and not self.done:
            self.done = True
            self.html_lang = _lang_attr(attrs)


def extract_html_lang(html: bytes | str) -> str | None:
    """Declared document language: the first ``<html>`` tag's ``lang``
    (or ``xml:lang``) attribute, normalized like :func:`_lang_attr`.
    The declared-vs-detected comparison (CommonCrawl's language
    annotation does exactly this) uses the primary subtag relationally
    downstream — the kernel keeps the full tag (``en-us``)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _HtmlLangParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.html_lang


def audit_head(html: bytes | str, base_url: str | None = None):
    """(title, canonical, noindex, nofollow, html_lang) in one parse.
    Title gets the crawl's truthy-only newline-strip transform;
    canonical resolves through CanonURL like :func:`extract_canonical`;
    html_lang matches :func:`extract_html_lang`."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _HeadAuditParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    title = "".join(p.title_parts) if p.title_parts is not None else None
    if title:
        title = title.replace("\n", "").strip()
    canonical = None
    if p.canonical is not None:
        target = CanonURL.parse(p.canonical)
        if not target.is_absolute:
            target = CanonURL.parse(base_url).join(p.canonical) if base_url else None
        canonical = str(target) if target is not None else None
    return title, canonical, p.noindex, p.nofollow, p.html_lang


HEAD_AUDIT_SCHEMA = StructType(
    [
        StructField("title", StringType(), True),
        StructField("canonical_url", StringType(), True),
        StructField("noindex", BooleanType(), False),
        StructField("nofollow", BooleanType(), False),
        StructField("html_lang", StringType(), True),
    ]
)


def make_head_audit_udf():
    """(html, page_url) → struct(title, canonical_url, noindex,
    nofollow, html_lang) — every head signal in ONE Arrow batch pass. At
    corpus scale this is the shape to use when more than one signal is
    consumed: separate kernels would decode and walk every page once per
    signal."""

    @pandas_udf(HEAD_AUDIT_SCHEMA)
    def head_audit_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
        vals = [audit_head(h, u) for h, u in zip(html, url)]
        return pd.DataFrame(
            vals, columns=["title", "canonical_url", "noindex", "nofollow",
                           "html_lang"])

    return head_audit_udf
