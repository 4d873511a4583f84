"""Post-scan presentation transforms (SURVEY.md §2.2 P10).

The reference rewrites metadata rows after the main query: NSFW image
substitution and imgproxy URL wrapping (ton-index-go/index/crud/
crud.go:185-226).  Pure column expressions — a `withColumn` pass over the
result, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLUR_PLACEHOLDER = "blurred://nsfw"


def rewrite_image_url(image: Column, proxy_base: str) -> Column:
    """Wrap external image URLs behind an image-proxy prefix; pass through
    NULLs and already-proxied values."""
    return F.when(
        image.isNull() | image.startswith(proxy_base), image
    ).otherwise(F.concat(F.lit(proxy_base), F.lit("/"), F.base64(F.encode(image, "UTF-8"))))


def apply_nsfw_policy(
    df: DataFrame,
    image_col: str = "image",
    nsfw_flag_col: str = "nsfw",
    proxy_base: str = "https://imgproxy.local",
) -> DataFrame:
    """Blur-substitute flagged rows, proxy-wrap the rest (crud.go:185-226)."""
    img = F.col(image_col)
    flagged = F.coalesce(F.col(nsfw_flag_col), F.lit(False))
    return df.withColumn(
        image_col,
        F.when(flagged, F.lit(BLUR_PLACEHOLDER)).otherwise(
            rewrite_image_url(img, proxy_base)
        ),
    )


def _b64url(col: Column) -> Column:
    """base64.RawURLEncoding (no padding) of a binary column.  Spark's
    ``base64`` emits MIME line breaks past 76 chars — translate deletes
    them (chars with no mapping are dropped) alongside the +/ swap."""
    return F.regexp_replace(
        F.translate(F.base64(col), "+/\r\n", "-_"), "=+$", ""
    )


def imgproxy_signed_url(
    src: Column,
    preset: str,
    key: bytes,
    salt: bytes,
    ipfs_resolve_base: str = "https://ipfs.io/ipfs",
) -> Column:
    """HMAC-SHA256-signed imgproxy URL, column-expression form of the
    reference's ImgProxyUrlBuilder.BuildUrl
    (utils/imgproxy-url-resigner/main.go:33-47):

        path = "/pr:<preset>/" + b64url(resolved_src)
        sig  = b64url(HMAC_SHA256(key, salt || path))
        url  = "/" + sig + path

    with ``ipfs://X`` resolved to ``<ipfs_resolve_base>/X`` first
    (main.go:35-39).  HMAC is built from two ``sha2`` passes with the
    padded-key XOR blocks as binary literals — whole-stage codegen, no
    UDF, so a resign batch is a map-only column rewrite at any scale.
    NULL srcs pass through."""
    if len(key) > 64:
        import hashlib

        key = hashlib.sha256(key).digest()
    padded = key.ljust(64, b"\x00")
    ikey = bytes(b ^ 0x36 for b in padded)
    okey = bytes(b ^ 0x5C for b in padded)

    resolved = F.when(
        src.startswith("ipfs://"),
        F.concat(
            F.lit(ipfs_resolve_base + "/"),
            F.substring(src, 8, 2_000_000),
        ),
    ).otherwise(src)
    path = F.concat(
        F.lit(f"/pr:{preset}/"), _b64url(F.encode(resolved, "UTF-8"))
    )
    inner = F.unhex(
        F.sha2(
            F.concat(
                F.lit(bytearray(ikey)),
                F.lit(bytearray(salt)),
                F.encode(path, "UTF-8"),
            ),
            256,
        )
    )
    sig = _b64url(
        F.unhex(F.sha2(F.concat(F.lit(bytearray(okey)), inner), 256))
    )
    return F.when(src.isNull(), F.lit(None)).otherwise(
        F.concat(F.lit("/"), sig, path)
    )
