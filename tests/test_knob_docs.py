"""Every kernel-selection knob must have a README row.

Round-4 verdict: knobs shipped without documentation twice
(EMIP_PVT_DOUBLE_BATCH, the SR-attention impl knob). This grep-driven
test makes the README knob table structurally exhaustive: every
``resolve(...)`` call site in ``emip_tpu/`` — by env-var name when it
has one, by knob name otherwise — must appear in README.md.

No jax import; pure source scan, runs in milliseconds.
"""

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent
README = (REPO / "README.md").read_text()

# resolve("name", default[, env="VAR"]) — tolerate multi-line call sites
_CALL = re.compile(
    r"""resolve\(\s*["']([a-z0-9_]+)["']""", re.VERBOSE
)
_ENV = re.compile(r"""env\s*=\s*["']([A-Z0-9_]+)["']|,\s*["']([A-Z0-9_]+)["']\)""")


def _knob_sites():
    sites = []
    for path in (REPO / "emip_tpu").rglob("*.py"):
        src = path.read_text()
        for m in _CALL.finditer(src):
            # scan the ~200 chars after the knob name for an env kwarg /
            # trailing positional env string
            window = src[m.start(): m.start() + 200]
            env = None
            em = _ENV.search(window)
            if em:
                env = em.group(1) or em.group(2)
            sites.append((str(path.relative_to(REPO)), m.group(1), env))
    return sites


def test_every_resolve_site_has_a_readme_row():
    sites = _knob_sites()
    assert sites, "no resolve() call sites found — did knobs.py move?"
    missing = []
    for path, name, env in sites:
        token = env if env else name
        if f"`{token}`" not in README and token not in README:
            missing.append((path, name, env))
    assert not missing, (
        "knobs without a README row (add to the 'Knobs (env vars)' "
        f"table): {missing}"
    )


def test_known_knobs_are_found_by_the_scanner():
    """Guard the scanner itself: the knobs we know exist must be seen."""
    found = {(name, env) for _, name, env in _knob_sites()}
    expected = {
        ("ltm_read_impl", "EMIP_LTM_READ"),
        ("win_rowtile_min_t", "EMIP_WIN_ROWTILE_MIN_T"),
        ("pvt_double_batch", "EMIP_PVT_DOUBLE_BATCH"),
        ("sr_attention_fused", "EMIP_SR_ATTN_FUSED"),
        ("splat_q_chunk", "SPLAT_QC"),
        ("fused_block_max_t", "EMIP_FUSED_BLOCK_MAX_T"),
    }
    assert expected <= found, expected - found
