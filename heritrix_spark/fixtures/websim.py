"""The synthetic web — closed-form URL space + link graph (seed 42).

Everything here is a pure integer function of ``xxhash64`` (seed 42), so the
same web is computable two ways with bit-exact agreement:

* pure Python (this module) — used by the ordering oracle
  ``oracle/heritrix_sim.py`` and fixture generation;
* Spark SQL expressions over ``F.xxhash64`` (``heritrix_spark/operators/
  extract.py``) — the engine's JVM-side outlink extractor (no Python in the
  hot path, per BASELINE.json input_hint).

Design requirements it satisfies (FIXTURES.md §1.2):

* **Hot-host skew** (north_rule): host index drawn by a nested-modulus
  power-law ``i = x3 mod (1 + (x2 mod (1 + (x1 mod H))))`` — integer-exact
  (no float pow, whose libm last-ulp differences could diverge JVM vs
  CPython), heavily skewed toward host 0.

All hash values are SIGNED 64-bit (Spark ``xxhash64`` output) and every
modulus is Python's floored ``%`` — identical to Spark's ``pmod`` on signed
longs, so each rule is one-to-one with a JVM-side expression.
* **Calendar-trap URLs** (~2%) exercising AntiCalendarCostAssignmentPolicy.
* **Duplicate-variant link occurrences** (~5%) — www-prefix, session-id
  query, trailing '?', userinfo — that canonicalize back to the base URL
  (Canonicalizer + UriUniqFilter coverage).
* **~3% dangling links** (image id beyond the corpus) → 404 paths.
* Outlinks are a function of the page id alone: 3 navlinks (L), 2 embeds
  (E), +1 speculative (X) when ``k % 7 == 0``.  Trap pages are leaves.
"""

from __future__ import annotations

from dataclasses import dataclass

from heritrix_spark.functions.fingerprint import hash_str_py

HOST_FMT = "h{:04d}.example.test"
TRAP_MOD = 50  # ~2% of pages get a calendar-shaped path
VARIANT_MOD = 20  # ~5% of link occurrences are duplicate variants
MISS_FACTOR = 1.03  # link-target space is 3% larger than the corpus
PAGE_BUCKET = 100
N_SEED_HOSTS = 5
SESSION_TOKEN = "0123456789abcdefgh"


@dataclass(frozen=True)
class FixtureSpec:
    name: str
    n_images: int
    n_hosts: int
    with_payload: bool

    @property
    def n_link_space(self) -> int:
        return int(self.n_images * MISS_FACTOR)


SPECS = {
    "tiny": FixtureSpec("tiny", 200, 3, True),
    "small": FixtureSpec("small", 20_000, 50, False),
    "bench": FixtureSpec("bench", 1_000_000, 1000, False),
    # Scaling-run corpus: large enough that superstep tasks carry real
    # compute (the 10^10 design scale's local stand-in).
    "bench2": FixtureSpec("bench2", 10_000_000, 2000, False),
}


def _u(tag: str, *parts: int) -> int:
    """Signed xxhash64 of 'tag:p1:p2:…' — the fixture RNG.

    Callers apply Python ``%`` (floored) == Spark ``pmod``; ``>>`` (floored
    arithmetic shift) == Spark ``shiftright``.
    """
    return hash_str_py(tag, *[str(p) for p in parts])


def host_index(k: int, n_hosts: int) -> int:
    """Nested-modulus power-law host pick — integer-exact skew."""
    b1 = _u("h1", k) % n_hosts
    b2 = _u("h2", k) % (b1 + 1)
    return _u("h3", k) % (b2 + 1)


def host_of_k(k: int, n_hosts: int) -> str:
    return HOST_FMT.format(host_index(k, n_hosts))


def is_trap(k: int) -> bool:
    return _u("trap", k) % TRAP_MOD == 0


def url_of(k: int, n_hosts: int) -> str:
    """Canonical URL of page k (trap pages get calendar paths)."""
    host = host_of_k(k, n_hosts)
    if is_trap(k):
        return (f"http://{host}/cal/2026/{1 + k % 12:02d}/{1 + k % 28:02d}"
                f"/img{k:08d}")
    return f"http://{host}/p/{k // PAGE_BUCKET}/img{k:08d}"


def image_id_of_url(url: str) -> int | None:
    """Inverse of url_of: extract page id; None if not an image URL."""
    i = url.rfind("/img")
    if i == -1:
        return None
    tail = url[i + 4:i + 12]
    return int(tail) if tail.isdigit() and len(tail) == 8 else None


def variant_of(url: str, k: int, j: int) -> str:
    """Duplicate-variant decoration of a link occurrence (canonicalizes back)."""
    v = _u("var", k, j)
    if v % VARIANT_MOD != 0:
        return url
    kind = (v >> 8) % 4
    if kind == 0:
        return url.replace("http://", "http://www.", 1)
    if kind == 1:
        return url + f"?jsessionid={SESSION_TOKEN}{k % 10}"
    if kind == 2:
        return url + "?"
    return url.replace("http://", "http://user@", 1)


def outlinks(k: int, spec: FixtureSpec) -> list[tuple[str, str]]:
    """Outlinks of page k: [(url, hop)] — 3 L + 2 E (+1 X if k%7==0).

    Trap pages are leaves (no outlinks) so calendar lattices stay finite.
    Targets live in a space 3% larger than the corpus → dangling 404 links.
    """
    if is_trap(k) or k >= spec.n_images:
        return []
    m = spec.n_link_space
    out: list[tuple[str, str]] = []
    hops = ["L", "L", "L", "E", "E"]
    n = 6 if k % 7 == 0 else 5
    for j in range(n):
        t = _u("link", k, j) % m
        hop = hops[j] if j < 5 else "X"
        out.append((variant_of(url_of(t, spec.n_hosts), k, j), hop))
    return out


def seeds(spec: FixtureSpec, n_hosts: int | None = None) -> list[str]:
    """Smallest page id of each of the first N host indexes (default
    N_SEED_HOSTS; benches pass a wider list — wide crawls start wide)."""
    want = min(n_hosts if n_hosts is not None else N_SEED_HOSTS,
               spec.n_hosts)
    found: dict[int, int] = {}
    for k in range(spec.n_images):
        i = host_index(k, spec.n_hosts)
        if i < want and i not in found:
            found[i] = k
            if len(found) == want:
                break
    return [url_of(found[i], spec.n_hosts) for i in sorted(found)]


def robots_rules(spec: FixtureSpec) -> list[tuple[str, str, bool, int]]:
    """(host, path_prefix, allow, rule_order): every 10th host (incl. the
    hot host 0) disallows /p/0; hosts ≡13 (mod 25) disallow everything —
    deliberately NOT the Zipf-hot host, which would sever most of the link
    graph.  robots.txt itself is always fetchable."""
    rules = []
    for i in range(spec.n_hosts):
        host = HOST_FMT.format(i)
        if i % 25 == 13:
            rules.append((host, "/", False, 0))
        elif i % 10 == 0:
            rules.append((host, "/p/0", False, 0))
    return rules


def crawl_delays(spec: FixtureSpec) -> dict[str, int]:
    """Every 5th host advertises Crawl-delay: 2s (superset mode only)."""
    return {HOST_FMT.format(i): 2000 for i in range(0, spec.n_hosts, 5)}


def scope_surt_prefixes() -> tuple[str, ...]:
    """Domain-level SURT scope covering every fixture host."""
    return ("http://(test,example,",)
