"""Blocklist guardrail pipeline (utils/blocklist.py) — mirrors the
reference's blocklist_test.py partial-match cases plus the censor, lemma,
whitelist, keyword-dir and leet-variant stages the reference exercises in
production (imaginaire/auxiliary/guardrail/blocklist/blocklist.py)."""

import pytest

from cosmos_predict2_tpu.utils.blocklist import (
    Blocklist,
    LeetCensor,
    lemmatize,
    read_keyword_list_from_dir,
    to_ascii,
)


# ------------------- partial match (reference blocklist_test.py) -------------------


@pytest.mark.level(0)
def test_exact_match():
    """Reference test_exact_match."""
    match, message = Blocklist.check_partial_match("this contains badword in the middle", "badword", 0.4)
    assert match is True
    assert "badword" in message


@pytest.mark.level(0)
def test_no_match():
    """Reference test_no_match."""
    match, message = Blocklist.check_partial_match("this is a clean prompt", "badword", 0.4)
    assert match is False
    assert message == ""


@pytest.mark.level(0)
def test_partial_match_with_threshold():
    """Reference test_partial_match_with_threshold: one-character leeway."""
    match, _ = Blocklist.check_partial_match("this contains badw0rd here", "badword", 1.0)
    assert match is True
    match, _ = Blocklist.check_partial_match("this contains badw0rd here", "badword", 0.5)
    assert match is False


@pytest.mark.level(0)
def test_partial_match_multiword():
    match, _ = Blocklist.check_partial_match("look a child abuze case", "child abuse", 1.0)
    assert match is True


# ------------------------------- censor stage -------------------------------


@pytest.mark.level(0)
def test_censor_word_boundaries():
    bl = Blocklist()
    bl.blocklist_words = ["grape"]
    bl._censor = LeetCensor(["grape"])
    blocked, msg = bl.censor_prompt("a grape on the table")
    assert blocked and "*" in msg
    # substring inside a longer word must NOT trigger (word boundaries)
    blocked, _ = bl.censor_prompt("a grapefruit on the table")
    assert not blocked


@pytest.mark.level(0)
def test_censor_leet_variants():
    censor = LeetCensor(["assault"])
    assert "*" in censor.censor("a55ault footage")
    assert "*" in censor.censor("ASSAULT!")
    assert "*" not in censor.censor("a salt shaker")


@pytest.mark.level(0)
def test_whitelist_uncensor():
    bl = Blocklist()
    bl.blocklist_words = ["basement"]
    bl.whitelist_words = ["basement"]
    bl._censor = LeetCensor(["basement"], whitelist=["basement"])
    safe, _ = bl.is_safe("a basement workshop")
    assert safe


# ------------------------------- lemma stage -------------------------------


@pytest.mark.level(0)
def test_lemmatize_rules():
    assert lemmatize("knives") == "knife"
    assert lemmatize("children") == "child"
    assert lemmatize("tortures") == "torture"
    assert lemmatize("beheadings") in ("beheading", "behead")
    assert lemmatize("gore") == "gore"


@pytest.mark.level(0)
def test_lemma_pass_blocks_inflections():
    bl = Blocklist()
    bl.blocklist_words = ["decapitation"]
    bl.exact_match_words = []
    bl._censor = LeetCensor(["decapitation"])
    safe, msg = bl.is_safe("three decapitations on camera")
    assert not safe and "Censored" in msg


# --------------------------- exact-match stage ---------------------------


@pytest.mark.level(0)
def test_whole_word_blocklist():
    blocked, msg = Blocklist.check_against_whole_word_blocklist(
        "A   swastika   flag", ["swastika"]
    )
    assert blocked and "Exact Match" in msg
    blocked, _ = Blocklist.check_against_whole_word_blocklist("a swan lake", ["swastika"])
    assert not blocked


# ------------------------------ full pipeline ------------------------------


@pytest.mark.level(0)
def test_is_safe_pipeline_defaults():
    bl = Blocklist()
    assert bl.is_safe("a robot arm stacking boxes in a warehouse")[0]
    assert not bl.is_safe("")[0]  # empty input is unsafe (reference :205)
    assert not bl.is_safe("extreme gore footage")[0]
    assert not bl.is_safe("nazi rally")[0]  # exact-match list
    # to_ascii strips non-ascii before matching
    assert bl.is_safe(to_ascii("un café à Paris"))[0]


@pytest.mark.level(0)
def test_keyword_dir_loading(tmp_path):
    """The released Cosmos-Guardrail1 blocklist layout loads unchanged
    (custom/ whitelist/ exact_match/, one keyword per line)."""
    for sub, words in (
        ("custom", ["zorgon", "flibber attack"]),
        ("whitelist", ["basement"]),
        ("exact_match", ["quuxmark"]),
    ):
        d = tmp_path / sub
        d.mkdir()
        (d / "words.txt").write_text("\n".join(words) + "\n")
    bl = Blocklist(checkpoint_dir=str(tmp_path))
    assert bl.blocklist_words == ["zorgon", "flibber attack"]
    assert not bl.is_safe("a zorgon appears")[0]
    assert not bl.is_safe("flibber attack at dawn")[0]
    assert not bl.is_safe("the quuxmark stands")[0]
    assert bl.is_safe("a basement workshop")[0]
    assert read_keyword_list_from_dir(str(tmp_path / "missing")) == []
