"""pandas re-derivation of the reference's ETL semantics (the oracle for
parity mode). Mirrors the observable behavior documented in SURVEY.md §1.3 /
§2 — including clean-after-dedup, astype(str) NaN stringification, the
run-date stamp (Q1), float-string canton keys (Q3) and m:m lookups (Q4) —
without reproducing the reference's code organization (no GCS/BigQuery, one
function per table, injected run date)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

VEH_COLS = [
    "CÓDIGO DE VEHÍCULO", "MARCA", "MODELO", "PAÍS", "AÑO MODELO", "CLASE",
    "SUB CLASE", "TIPO", "CILINDRAJE", "TIPO COMBUSTIBLE", "COLOR 1", "COLOR 2",
]
VEH_CLEAN = ["MARCA", "MODELO", "PAÍS", "CLASE", "SUB CLASE", "TIPO", "TIPO COMBUSTIBLE"]
VEH_RENAME = {
    "CÓDIGO DE VEHÍCULO": "CodigoVehiculo", "MARCA": "Marca", "MODELO": "Modelo",
    "PAÍS": "Pais", "AÑO MODELO": "AnioModelo", "CLASE": "Clase",
    "SUB CLASE": "SubClase", "TIPO": "Tipo", "CILINDRAJE": "Cilindraje",
    "TIPO COMBUSTIBLE": "TipoCombustible", "COLOR 1": "Color1", "COLOR 2": "Color2",
}
TRA_COLS = ["TIPO TRANSACCIÓN", "TIPO SERVICIO", "PERSONA NATURAL - JURÍDICA", "CATEGORÍA"]
TRA_RENAME = {
    "TIPO TRANSACCIÓN": "TipoTransaccion", "TIPO SERVICIO": "TipoServicio",
    "PERSONA NATURAL - JURÍDICA": "PersonaTipo", "CATEGORÍA": "Categoria",
}


def oracle_dim_tiempo() -> pd.DataFrame:
    fechas = pd.date_range("2020-01-01", "2025-12-31", freq="D")
    meses = ["Enero", "Febrero", "Marzo", "Abril", "Mayo", "Junio", "Julio",
             "Agosto", "Septiembre", "Octubre", "Noviembre", "Diciembre"]
    dias = ["Lunes", "Martes", "Miércoles", "Jueves", "Viernes", "Sábado", "Domingo"]
    return pd.DataFrame({
        "ID_Tiempo": range(1, len(fechas) + 1),
        "FechaCompleta": fechas.date,
        "Anio": fechas.year,
        "Trimestre": fechas.quarter,
        "Mes": fechas.month,
        "Dia": fechas.day,
        "NombreMes": [meses[m - 1] for m in fechas.month],
        "NombreDiaSemana": [dias[d] for d in fechas.dayofweek],
    })


def oracle_dim_vehiculo(df: pd.DataFrame) -> pd.DataFrame:
    dim = df[VEH_COLS].drop_duplicates().reset_index(drop=True)
    dim["ID_Vehiculo"] = range(1, len(dim) + 1)
    for c in VEH_CLEAN:
        dim[c] = dim[c].astype(str).str.upper().str.strip()
    dim["COLOR 2"] = dim["COLOR 2"].fillna("N/A")
    dim = dim.rename(columns=VEH_RENAME)
    return dim[["ID_Vehiculo"] + list(VEH_RENAME.values())]


def oracle_dim_transaccion(df: pd.DataFrame) -> pd.DataFrame:
    dim = df[TRA_COLS].drop_duplicates().reset_index(drop=True)
    dim["ID_Transaccion"] = range(1, len(dim) + 1)
    for c in TRA_COLS:
        dim[c] = dim[c].astype(str).str.upper().str.strip()
    dim = dim.rename(columns=TRA_RENAME)
    return dim[["ID_Transaccion"] + list(TRA_RENAME.values())]


def oracle_dim_ubicacion(df: pd.DataFrame, canton_map: dict) -> pd.DataFrame:
    codes = df["CANTÓN"].dropna().unique()
    out = []
    for i, code in enumerate(codes, start=1):
        key = str(code).strip()
        if key in canton_map:
            canton, prov, reg = canton_map[key]
        else:
            canton, prov, reg = f"CANTON_{key}", "NO_IDENTIFICADA", "NO_IDENTIFICADA"
        out.append({
            "ID_Ubicacion": i, "CodigoCanton": key, "NombreCanton": canton,
            "Provincia": prov, "Region": reg, "Pais": "ECUADOR",
        })
    return pd.DataFrame(out)


def oracle_fact(
    df: pd.DataFrame,
    dim_tiempo: pd.DataFrame,
    dim_vehiculo: pd.DataFrame,
    dim_transaccion: pd.DataFrame,
    dim_ubicacion: pd.DataFrame,
    run_date: dt.date,
) -> pd.DataFrame:
    h = df.copy()
    # Q1: the reference's candidate list never matches the real header
    h["FECHA_PROCESO_DATE"] = run_date
    h = h.merge(dim_tiempo[["ID_Tiempo", "FechaCompleta"]],
                left_on="FECHA_PROCESO_DATE", right_on="FechaCompleta", how="left")
    h = h.merge(dim_vehiculo[["ID_Vehiculo", "CodigoVehiculo"]],
                left_on="CÓDIGO DE VEHÍCULO", right_on="CodigoVehiculo", how="left")
    h = h.merge(dim_transaccion[["ID_Transaccion", "TipoTransaccion", "TipoServicio"]],
                left_on=["TIPO TRANSACCIÓN", "TIPO SERVICIO"],
                right_on=["TipoTransaccion", "TipoServicio"], how="left")
    h["__canton_str"] = h["CANTÓN"].astype(str)
    h = h.merge(dim_ubicacion[["ID_Ubicacion", "CodigoCanton"]],
                left_on="__canton_str", right_on="CodigoCanton", how="left")
    h["ID_Registro"] = range(1, len(h) + 1)
    h["CantidadRegistros"] = 1
    h["MontoAvaluo"] = pd.to_numeric(h["AVALÚO"], errors="coerce").fillna(0)
    fact = h[["ID_Registro", "ID_Tiempo", "ID_Vehiculo", "ID_Transaccion",
              "ID_Ubicacion", "CantidadRegistros", "MontoAvaluo"]].copy()
    for c in ["ID_Tiempo", "ID_Vehiculo", "ID_Transaccion", "ID_Ubicacion"]:
        fact[c] = fact[c].fillna(1)
    return fact.fillna(0)
