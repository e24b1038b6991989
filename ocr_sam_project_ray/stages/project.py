"""CRM-style flat projection stage: annotated segments → one row per person.

Pure column mapping (no external sink — SURVEY.md §1.3 maps the reference's
CRM payload to a flat projection). Parity targets:
- person formatting + name split flavor A: src/ocr_processor/app.py:464-524
- safe_string / safe_number / safe_date: src/crm_integrator/app.py:454-491
- date canonicalization: src/crm_integrator/app.py:692-742
- priority / urgency: src/crm_integrator/app.py:404-447 (already computed
  by the annotate stage; carried through)
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textops import (
    parse_date_es, parse_monto, safe_number, safe_string, split_name,
    split_name_b,
)

NAME_FLAVORS = {"a": split_name, "b": split_name_b}


def project_persons_batch(batch: pa.Table, name_flavor: str = "a") -> pa.Table:
    splitter = NAME_FLAVORS[name_flavor]
    doc_ids = batch["doc_id"].to_pylist()
    entities = batch["entities"].to_pylist()
    labels = batch["type_label"].to_pylist()
    fechas = batch["fecha"].to_pylist()
    priorities = batch["priority"].to_pylist()
    urgents = batch["urgent"].to_pylist()

    out: dict[str, list] = {k: [] for k in [
        "doc_id", "secuencia", "nombre_completo", "nombre", "apellido_paterno",
        "apellido_materno", "nombre_segundo", "identificacion", "monto",
        "monto_numerico", "tipo_oficio", "fecha_iso", "priority", "urgent",
    ]}

    for i, ents in enumerate(entities):
        if not ents:
            continue
        for seq, ent in enumerate(ents, start=1):
            nombre_completo = safe_string(ent["nombre_completo"])
            if not nombre_completo:
                continue
            parts = splitter(nombre_completo)
            monto_num = ent["monto_numerico"]
            if monto_num == 0.0 and ent["monto"]:
                monto_num = parse_monto(ent["monto"])
            out["doc_id"].append(doc_ids[i])
            out["secuencia"].append(seq)
            out["nombre_completo"].append(nombre_completo)
            out["nombre"].append(parts["nombre"])
            out["apellido_paterno"].append(parts["apellido_paterno"])
            out["apellido_materno"].append(parts["apellido_materno"])
            out["nombre_segundo"].append(parts["nombre_segundo"])
            out["identificacion"].append(safe_string(ent["numero_identificacion"]))
            out["monto"].append(ent["monto"])
            out["monto_numerico"].append(safe_number(monto_num))
            out["tipo_oficio"].append(labels[i])
            out["fecha_iso"].append(parse_date_es(fechas[i], nullable=False))
            out["priority"].append(priorities[i])
            out["urgent"].append(urgents[i])

    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "secuencia": pa.array(out["secuencia"], pa.int64()),
            "nombre_completo": pa.array(out["nombre_completo"], pa.string()),
            "nombre": pa.array(out["nombre"], pa.string()),
            "apellido_paterno": pa.array(out["apellido_paterno"], pa.string()),
            "apellido_materno": pa.array(out["apellido_materno"], pa.string()),
            "nombre_segundo": pa.array(out["nombre_segundo"], pa.string()),
            "identificacion": pa.array(out["identificacion"], pa.string()),
            "monto": pa.array(out["monto"], pa.string()),
            "monto_numerico": pa.array(out["monto_numerico"], pa.float64()),
            "tipo_oficio": pa.array(out["tipo_oficio"], pa.string()),
            "fecha_iso": pa.array(out["fecha_iso"], pa.string()),
            "priority": pa.array(out["priority"], pa.string()),
            "urgent": pa.array(out["urgent"], pa.bool_()),
        }
    )
