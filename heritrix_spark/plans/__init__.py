"""Driver-side plans: the CrawlJob BSP superstep loop (frontier scheduler,
fetch, extract, disposition) with checkpoint/resume."""
