"""Set-at-a-time operators: extractor (outlink flatMap), scope decide-rule
fold, robots predicate, candidate pipeline (canonicalize → scope → dedup →
ordinal assignment), and the burst scheduler window."""
