"""Web-corpus preparation operators: URL canonicalization / host
aggregation and HTML boilerplate stripping — the first normalization
steps of every web-scale LLM data pipeline (CommonCrawl-style corpora
dedupe by canonical URL before any content pass, and extract body text
before quality scoring).

Both operators are pure JVM-side expression chains (regexp/split/sort
inside whole-stage codegen): no Python in the hot path, no shuffle —
they compose with the downstream dedup/quality stages (pipeline/dedup.py,
pipeline/text.py) as narrow projections.  At 100 TB each is a
flat map over the corpus; host-level aggregation is one hash shuffle on
the (well-distributed) host key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never identify content (tracking/session ids)
TRACKING_PARAMS = (
    "utm_source utm_medium utm_campaign utm_term utm_content "
    "fbclid gclid msclkid ref_src mc_cid mc_eid"
).split()


def canonicalize_url(url: Column) -> Column:
    """Normalize a raw URL to its canonical dedup key:

    * scheme and host lowercased; ``www.`` prefix and default ports
      (``:80``/``:443``) dropped;
    * fragment removed;
    * tracking query params (TRACKING_PARAMS) removed, the remaining
      params sorted alphabetically (param order never identifies
      content);
    * trailing ``/`` of the path dropped.

    Everything is array/regexp expressions — codegen-friendly, no UDF.
    """
    # scheme://host[:port]  — lowercase, strip www. and default ports
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(url, r"\?([^#]*)", 1)

    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "")
            & ~F.lower(F.split(kv, "=")[0]).isin(TRACKING_PARAMS),
        )
    )
    qcanon = F.concat_ws("&", kept)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


def url_host(url: Column) -> Column:
    """Canonical host of a raw URL (lowercased, www./default-port
    stripped) — the key for host-level stats, robots policies, and
    domain-mix rebalancing (pipeline/curation.py p26)."""
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":(80|443)$", "")


#: (entity, char) decode table — &amp; LAST so "&amp;lt;" cannot
#: double-decode into "<"
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

#: container elements whose entire content is boilerplate
BOILERPLATE_BLOCKS = ["script", "style", "head", "nav", "footer", "aside"]


def html_extract_text(html: Column) -> Column:
    """Strip an HTML document to its body text (trafilatura-style
    heuristic, expression-only):

    * drop whole boilerplate containers (<script>/<style>/<head>/
      <nav>/<footer>/<aside>) including their content;
    * drop ad-classed <div> blocks (class contains ads/banner/promo);
    * strip remaining tags, decode the common entities, collapse
      whitespace.

    A deliberate regex heuristic, not an HTML5 parser: on malformed
    markup it degrades to keeping text (never dropping it), which is
    the right failure mode for corpus prep."""
    c = html
    for tag in BOILERPLATE_BLOCKS:
        c = F.regexp_replace(c, rf"(?is)<{tag}\b[^>]*>.*?</{tag}>", " ")
    c = F.regexp_replace(
        c,
        r'(?is)<div[^>]*class="[^"]*\b(?:ads?|banner|promo)\b[^"]*"[^>]*>.*?</div>',
        " ",
    )
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))
