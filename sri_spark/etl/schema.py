"""SRI source-table schema contract and geographic lookup data.

The reference reads the CSV with inferred pandas dtypes per task (reference
dags/sri_vehiculos_etl_dag.py:136-141 etc.); we declare the schema once
(SURVEY §1.4). Column names are the exact header strings of
`csv_file/VEHICULOS_SRI.csv:1` — accents, spaces and the misleading
`(DD/MM/AA)` suffixes are load-bearing (Q1).

Type choices mirror what pandas infers on the production file:
- numeric-with-nulls columns are DoubleType (pandas promotes int+NaN to
  float64 — the root of the '10701.0' canton-key quirk, Q3);
- AVALÚO is kept as StringType and coerced later, mirroring
  `pd.to_numeric(errors='coerce')` (:547) even when the file carries garbage;
- date columns are StringType, parsed explicitly (Q2).
"""

from __future__ import annotations

from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

# exact header order of csv_file/VEHICULOS_SRI.csv:1
COL_CATEGORIA = "CATEGORÍA"
COL_CODIGO = "CÓDIGO DE VEHÍCULO"
COL_TIPO_TRANSACCION = "TIPO TRANSACCIÓN"
COL_MARCA = "MARCA"
COL_MODELO = "MODELO"
COL_PAIS = "PAÍS"
COL_ANIO_MODELO = "AÑO MODELO"
COL_CLASE = "CLASE"
COL_SUB_CLASE = "SUB CLASE"
COL_TIPO = "TIPO"
COL_AVALUO = "AVALÚO"
COL_FECHA_PROCESO = "FECHA PROCESO (DD/MM/AA)"
COL_TIPO_SERVICIO = "TIPO SERVICIO"
COL_CILINDRAJE = "CILINDRAJE"
COL_TIPO_COMBUSTIBLE = "TIPO COMBUSTIBLE"
COL_FECHA_COMPRA = "FECHA COMPRA (DD/MM/AA)"
COL_CANTON = "CANTÓN"
COL_COLOR1 = "COLOR 1"
COL_COLOR2 = "COLOR 2"
COL_PERSONA = "PERSONA NATURAL - JURÍDICA"

SRI_SCHEMA = StructType(
    [
        StructField(COL_CATEGORIA, LongType()),
        StructField(COL_CODIGO, LongType()),
        StructField(COL_TIPO_TRANSACCION, StringType()),
        StructField(COL_MARCA, StringType()),
        StructField(COL_MODELO, StringType()),
        StructField(COL_PAIS, StringType()),
        StructField(COL_ANIO_MODELO, DoubleType()),
        StructField(COL_CLASE, StringType()),
        StructField(COL_SUB_CLASE, StringType()),
        StructField(COL_TIPO, StringType()),
        StructField(COL_AVALUO, StringType()),
        StructField(COL_FECHA_PROCESO, StringType()),
        StructField(COL_TIPO_SERVICIO, StringType()),
        StructField(COL_CILINDRAJE, DoubleType()),
        StructField(COL_TIPO_COMBUSTIBLE, StringType()),
        StructField(COL_FECHA_COMPRA, StringType()),
        StructField(COL_CANTON, DoubleType()),
        StructField(COL_COLOR1, StringType()),
        StructField(COL_COLOR2, StringType()),
        StructField(COL_PERSONA, StringType()),
    ]
)

# dim_vehiculo source columns (reference :146-150) and rename map (:173-186)
VEHICULO_COLS = [
    COL_CODIGO,
    COL_MARCA,
    COL_MODELO,
    COL_PAIS,
    COL_ANIO_MODELO,
    COL_CLASE,
    COL_SUB_CLASE,
    COL_TIPO,
    COL_CILINDRAJE,
    COL_TIPO_COMBUSTIBLE,
    COL_COLOR1,
    COL_COLOR2,
]
VEHICULO_RENAME = {
    COL_CODIGO: "CodigoVehiculo",
    COL_MARCA: "Marca",
    COL_MODELO: "Modelo",
    COL_PAIS: "Pais",
    COL_ANIO_MODELO: "AnioModelo",
    COL_CLASE: "Clase",
    COL_SUB_CLASE: "SubClase",
    COL_TIPO: "Tipo",
    COL_CILINDRAJE: "Cilindraje",
    COL_TIPO_COMBUSTIBLE: "TipoCombustible",
    COL_COLOR1: "Color1",
    COL_COLOR2: "Color2",
}
# text columns standardized upper+trim (reference :164-166)
VEHICULO_CLEAN_COLS = [
    COL_MARCA,
    COL_MODELO,
    COL_PAIS,
    COL_CLASE,
    COL_SUB_CLASE,
    COL_TIPO,
    COL_TIPO_COMBUSTIBLE,
]

# dim_transaccion source columns (reference :234-238) and rename map (:253-258)
TRANSACCION_COLS = [COL_TIPO_TRANSACCION, COL_TIPO_SERVICIO, COL_PERSONA, COL_CATEGORIA]
TRANSACCION_RENAME = {
    COL_TIPO_TRANSACCION: "TipoTransaccion",
    COL_TIPO_SERVICIO: "TipoServicio",
    COL_PERSONA: "PersonaTipo",
    COL_CATEGORIA: "Categoria",
}

# canton code -> (canton, provincia, region): public Ecuador geography used by
# the reference's 17-entry lookup (reference :303-321); Pais is always ECUADOR
CANTON_MAP: dict[str, tuple[str, str, str]] = {
    "10701": ("CUENCA", "AZUAY", "SIERRA"),
    "10911": ("GIRON", "AZUAY", "SIERRA"),
    "10901": ("GUALACEO", "AZUAY", "SIERRA"),
    "10927": ("SANTA ISABEL", "AZUAY", "SIERRA"),
    "20606": ("PLAYAS", "GUAYAS", "COSTA"),
    "21101": ("GUAYAQUIL", "GUAYAS", "COSTA"),
    "21709": ("MILAGRO", "GUAYAS", "COSTA"),
    "31905": ("ZAMORA", "ZAMORA CHINCHIPE", "AMAZONIA"),
    "20501": ("QUITO", "PICHINCHA", "SIERRA"),
    "20505": ("CAYAMBE", "PICHINCHA", "SIERRA"),
    "30101": ("LAGO AGRIO", "SUCUMBIOS", "AMAZONIA"),
    "30201": ("GONZALO PIZARRO", "SUCUMBIOS", "AMAZONIA"),
    "30301": ("PUTUMAYO", "SUCUMBIOS", "AMAZONIA"),
    "30401": ("SHUSHUFINDI", "SUCUMBIOS", "AMAZONIA"),
    "30501": ("SUCUMBIOS", "SUCUMBIOS", "AMAZONIA"),
    "30601": ("CASCALES", "SUCUMBIOS", "AMAZONIA"),
    "30701": ("CUYABENO", "SUCUMBIOS", "AMAZONIA"),
}

FACT_COLS = [
    "ID_Registro",
    "ID_Tiempo",
    "ID_Vehiculo",
    "ID_Transaccion",
    "ID_Ubicacion",
    "CantidadRegistros",
    "MontoAvaluo",
]
