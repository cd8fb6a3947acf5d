"""URL parsing — the reference's only nontrivial scalar logic
(urls->http-hosts, reference core.clj:36-46): comma-split a URL list,
parse each into (host, scheme, port), defaulting the port to 9200 when
absent. Rebuilt as pure column expressions (F.split / F.parse_url /
F.coalesce), plus a driver-side variant for config parsing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PORT = 9200  # core.clj:43


def parse_url_columns(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add (host, scheme, port) columns parsed from a URL column; port
    defaults to 9200 when the URL omits it."""
    c = F.col(url_col)
    # port via regexp: Spark 4's parse_url(..., 'PORT') returns NULL even
    # for explicit ports, so extract "://host:<port>" directly
    port_str = F.regexp_extract(c, "^[a-zA-Z]+://[^/:]+:([0-9]+)", 1)
    return df.withColumns(
        {
            "host": F.parse_url(c, F.lit("HOST")),
            "scheme": F.lower(F.parse_url(c, F.lit("PROTOCOL"))),
            "port": F.coalesce(
                F.nullif(port_str, F.lit("")).cast("int"), F.lit(DEFAULT_PORT)
            ),
        }
    )


def explode_url_list(df: DataFrame, urls_col: str = "urls") -> DataFrame:
    """Comma-split a URL-list column into one row per URL
    (core.clj:37's str/split, then the per-URL parse)."""
    return parse_url_columns(
        df.withColumn("url", F.explode(F.split(F.col(urls_col), ","))), "url"
    )


@dataclass(frozen=True)
class HttpHost:
    host: str
    port: int
    scheme: str


def urls_to_http_hosts(urls: str) -> list[HttpHost]:
    """Driver-side equivalent for config parsing (what the reference
    feeds to the REST client builder)."""
    from urllib.parse import urlparse

    hosts = []
    for raw in urls.split(","):
        raw = raw.strip()
        parsed = urlparse(raw if "://" in raw else f"http://{raw}")
        hosts.append(
            HttpHost(
                host=parsed.hostname or "",
                port=parsed.port or DEFAULT_PORT,
                scheme=(parsed.scheme or "http").lower(),
            )
        )
    return hosts
