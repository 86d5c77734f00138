"""Pretrained-SAE registry: the published sae_table.md as a queryable API.

The vendored table (pretrained_saes.json) is the public compatibility
surface — 71 HF hub repos with fidelity metrics (reference
docs/sae_table.md); the registry must expose every row, filter correctly,
and the hub loader must target the published checkpoint convention.
"""

import pytest

from vit_prisma_tpu.sae import (
    get_pretrained_sae_info,
    list_pretrained_saes,
)


def test_table_counts_match_published():
    assert len(list_pretrained_saes()) == 71
    assert len(list_pretrained_saes(model="clip-b-32",
                                    family="vanilla-all-patches")) == 24
    assert len(list_pretrained_saes(model="clip-b-32",
                                    family="vanilla-cls-only")) == 12
    assert len(list_pretrained_saes(model="clip-b-32",
                                    family="topk-cls-only-k64")) == 12
    assert len(list_pretrained_saes(model="clip-b-32",
                                    family="vanilla-spatial-patches")) == 11
    assert len(list_pretrained_saes(model="dino-b-32")) == 12


def test_headline_row_metrics():
    """BASELINE.md's headline row: CLIP-B/32 layer-9 resid_post vanilla."""
    rows = list_pretrained_saes(model="clip-b-32",
                                family="vanilla-all-patches", layer=9,
                                sublayer="hook_resid_post")
    assert len(rows) == 1
    r = rows[0]
    assert r["repo_id"].startswith("prisma-multimodal/")
    assert r["expl_var_pct"] == 98.2
    assert r["avg_l0"] == 1533.5
    assert r["ce_recovered_pct"] == 100.32
    assert r["l1_coefficient"] == 1e-5


def test_info_lookup_and_unknown():
    some = list_pretrained_saes(model="dino-b-32", layer=5)[0]
    info = get_pretrained_sae_info(some["repo_id"])
    assert info["ce_recovered_pct"] == 100.19
    with pytest.raises(KeyError):
        get_pretrained_sae_info("nope/nothing")


def test_every_row_is_well_formed():
    for r in list_pretrained_saes():
        assert r["repo_id"].count("/") == 1
        assert r["sublayer"] in ("hook_resid_post", "hook_mlp_out")
        assert 0 <= r["layer"] <= 11
        assert r["ce_recovered_pct"] is not None
