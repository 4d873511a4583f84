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
