from ocr_sam_project_ray.functions.classify import (
    TAXONOMY, TRIGGERS, classify_text, is_urgent, matched_keywords, priority_for,
)


def test_taxonomy_complete():
    assert len(TAXONOMY) == 16
    assert {t[0] for t in TAXONOMY} == set(range(1, 17))


def test_first_match_specificity():
    # composite phrases must win over their substrings
    assert classify_text("se ordena traslado de fondos aprehendidos")[0] == 3
    assert classify_text("investigación de familia en curso")[0] == 11
    assert classify_text("proceso penal abierto")[0] == 12
    assert classify_text("investigación simple")[0] == 10
    assert classify_text("diligencia exhibitoria decretada")[0] == 16


def test_each_canonical_trigger_hits_its_type():
    from ocr_sam_project_ray.sources.synthetic import _TRIGGER_PHRASES

    for tid, phrase in _TRIGGER_PHRASES.items():
        assert classify_text(f"se ordena la medida de {phrase} conforme")[0] == tid


def test_unclassified():
    assert classify_text("texto sin palabras clave") == (
        0, "No clasificado", "No clasificado", "No clasificado"
    )


def test_matched_keywords():
    kws = matched_keywords("embargo y secuestro decretados")
    assert "embargo" in kws and "secuestro" in kws


def test_priority_rules():
    # crm_integrator/app.py:404-430
    assert priority_for("Oficios de Embargos", 0) == "High"
    assert priority_for("No clasificado", 60000) == "High"
    assert priority_for("No clasificado", 20000) == "Medium"
    assert priority_for("No clasificado", 100) == "Medium"


def test_urgency():
    assert is_urgent("Oficios de Secuestros Civiles")
    assert not is_urgent("Diligencia Exhibitoria")
