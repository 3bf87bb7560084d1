"""doonop_ray — a Ray-Data-native rebuild of the Plato-solutions/doonop
crawl engine: URL frontier + fetch scheduler driving streaming
ray.data.Dataset pipelines over Arrow batches of image+caption pairs.

Nothing in this package calls ray.init()/ray.shutdown(); sessions are
owned by bench.py / test fixtures / the external driver.
"""

from .config import CrawlConfig  # noqa: F401
