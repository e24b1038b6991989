from ocr_sam_project_ray.functions import extract_core as core


def test_parse_metadata_fields_and_defaults():
    meta = core.parse_metadata(
        "Empresa: Banco General\nCantidad: 3\nOrigen: Provincia de Colon\n"
        "Operador: Luis Serrano\ncontenido"
    )
    assert meta["empresa"] == "banco general"
    assert meta["cantidad_oficios_declarada"] == 3
    assert meta["origen"] == "provincia de colon"
    assert meta["operador"] == "luis serrano"
    assert meta["extraction_success"] is True

    empty = core.parse_metadata("sin bloques de encabezado")
    assert empty["empresa"] == "No especificado"
    assert empty["cantidad_oficios_declarada"] == 0
    assert empty["extraction_success"] is False


def test_parse_metadata_alternative_patterns():
    meta = core.parse_metadata("cliente: Acme\ntotal_oficios: 7")
    assert meta["empresa"] == "acme"
    assert meta["cantidad_oficios_declarada"] == 7


def test_split_segments_separator_and_tail():
    text = "a1\na2\n===\nb1\n---\nc1\nc2"
    assert core.split_segments(text) == ["a1\na2", "b1", "c1\nc2"]


def test_split_segments_no_separator_single():
    assert core.split_segments("solo\ncontenido") == ["solo\ncontenido"]
    assert core.split_segments("") == []


def test_split_segments_leading_separator_drops_empty():
    # separator at line 0: first range is [0,0) → no segment (pdf_service
    # end_page > start_page check)
    assert core.split_segments("===\nb1\nb2") == ["b1\nb2"]


def test_mint_doc_id():
    assert core.mint_doc_id("u", 0, 1) == "u"
    assert core.mint_doc_id("u", 1, 3) == "u#seg002"


def test_validate_count_tolerance():
    # validators.py:46-91
    assert core.validate_count(0, 5)[0] is False
    assert core.validate_count(3, 0)[0] is True          # auto-process
    assert core.validate_count(5, 5) == (True, "", "")
    assert core.validate_count(6, 5)[0] is True           # tolerance max(1, 0.5)=1
    assert core.validate_count(7, 5)[0] is False          # outside
    assert core.validate_count(55, 50)[0] is True         # 10% = 5
    assert core.validate_count(56, 50)[0] is False


def test_validate_panamanian_scoring():
    ents = [
        {"nombre_completo": "A", "numero_identificacion": "8-123-4567"},
        {"nombre_completo": "B", "numero_identificacion": "123-45678-90123"},
    ]
    v = core.validate_panamanian("JE-12-2025", "23 de mayo de 2025", ents)
    # valid: numero_oficio, fecha, clientes_validos, total_clientes = 4
    # invalid: cedula_B = 1 → 4/5 = 0.8 ≥ 0.7 → passed
    assert v["valid_count"] == 4
    assert v["invalid_count"] == 1
    assert abs(v["confidence_score"] - 0.8) < 1e-9
    assert v["validation_passed"] is True


def test_validate_panamanian_fail():
    v = core.validate_panamanian("garbage", "12/05/2025", [])
    assert v["confidence_score"] == 0.0
    assert v["validation_passed"] is False


def test_derive_confidence_ladder():
    assert core.derive_confidence(True, True, None) == "high"
    assert core.derive_confidence(True, False, None) == "medium"
    assert core.derive_confidence(False, False, None) == "low"
    assert core.derive_confidence(True, True, {"validation_passed": False,
                                               "confidence_score": 0.4}) == "low"
    assert core.derive_confidence(True, True, {"validation_passed": False,
                                               "confidence_score": 0.6}) == "high"
    assert core.derive_confidence(True, False, {"validation_passed": True,
                                                "confidence_score": 1.0}) == "high"


def test_annotate_segment_full():
    text = (
        "OFICIO: JE-881-2025\n"
        "Juzgado Primero de Circuito Civil de Panama comunica lo siguiente.\n"
        "Se ordena la medida de embargo conforme a derecho.\n"
        "Dado a los 23 de mayo de 2025.\n"
        "MARIA GOMEZ | 8-123-4567 | 1,500.00"
    )
    a = core.annotate_segment(text)
    assert a["numero_oficio"] == "JE-881-2025"
    assert a["type_id"] == 5
    assert a["type_label"] == "Oficios de Embargos"
    assert a["n_entities"] == 1
    assert a["monto_total"] == 1500.0
    assert a["confidence"] == "high"
    assert a["validation_passed"] is True
    fields = {s["field"] for s in a["spans"]}
    assert {"cedula", "oficio_number", "date_es"} <= fields
    # span offsets index into the text
    for s in a["spans"]:
        assert text[s["start"]:s["end"]] == s["text"]


def test_validate_metadata():
    ok, err, warn = core.validate_metadata(
        {"empresa": "Banco General", "cantidad_oficios_declarada": 3}
    )
    assert ok and not err
    ok, err, _ = core.validate_metadata({"empresa": "", "cantidad_oficios_declarada": 3})
    assert not ok and "empresa" in err
    ok, _, warn = core.validate_metadata(
        {"empresa": "Banco", "cantidad_oficios_declarada": 2000}
    )
    assert ok and "inusual" in warn
    ok, _, warn = core.validate_metadata(
        {"empresa": "ab", "cantidad_oficios_declarada": 1}
    )
    assert ok and "corto" in warn


def test_accept_result_predicate():
    # crm_integrator/app.py:153-223: success && any evidence present
    assert core.accept_result(True, "texto", 0, 0)
    assert core.accept_result(True, "", 5, 0)
    assert core.accept_result(True, "", 0, 2)
    assert not core.accept_result(True, "", 0, 0)
    assert not core.accept_result(False, "texto", 5, 2)
