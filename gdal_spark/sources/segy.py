"""SEG-Y seismic data reader, mirroring
gdal/ogr/ogrsf_frmts/segy/ogrsegylayer.cpp / ogrsegydatasource.cpp:

- two layers per file: the trace layer (point geometry at the scaled
  group coordinates, 70 standard trace-header fields + 4 rev-1.0
  fields + SAMPLE_ARRAY) and the geometry-less header layer
  (TEXT_HEADER + 31 binary file header fields);
- 3200-byte textual header (EBCDIC recoded to ASCII when the first
  byte isn't a printable 'C'), 400-byte big-endian binary header,
  240-byte trace headers;
- horizontal scalar semantics (positive multiply, negative divide,
  arc-second units / 3600) and the zero-sample fallback to the file
  header's samples-per-trace;
- sample formats: 1 IBM float, 2 int32, 3 int16, 5 IEEE float,
  8 int8.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from gdal_spark.functions import geometry as G

# (name, offset, size) — trace header, ogrsegylayer.cpp:360-452
TRACE_FIELDS = [
    ("TRACE_NUMBER_WITHIN_LINE", 0, 4),
    ("TRACE_NUMBER_WITHIN_FILE", 4, 4),
    ("ORIGINAL_FIELD_RECORD_NUMBER", 8, 4),
    ("TRACE_NUMBER_WITHIN_ORIGINAL_FIELD_RECORD", 12, 4),
    ("TRACE_IDENTIFICATION_CODE", 28, 2),
    ("ENSEMBLE_NUMBER", 20, 4),
    ("TRACE_NUMBER_WITHIN_ENSEMBLE", 24, 4),
    ("NUMBER_VERTICAL_SUMMED_TRACES", 30, 2),
    ("NUMBER_HORIZONTAL_STACKED_TRACES", 32, 2),
    ("DATA_USE", 34, 2),
    ("DISTANCE_SOURCE_GROUP", 36, 4),
    ("RECEIVER_GROUP_ELEVATION", 40, 4),
    ("SURFACE_ELEVATION_AT_SOURCE", 44, 4),
    ("SOURCE_DEPTH_BELOW_SURFACE", 48, 4),
    ("DATUM_ELEVATION_AT_RECEIVER_GROUP", 52, 4),
    ("DATUM_ELEVATION_AT_SOURCE", 56, 4),
    ("WATER_DEPTH_AT_SOURCE", 60, 4),
    ("WATER_DEPTH_AT_GROUP", 64, 4),
    ("VERTICAL_SCALAR", 68, 2),
    ("HORIZONTAL_SCALAR", 70, 2),
    ("SOURCE_X", 72, 4),
    ("SOURCE_Y", 76, 4),
    ("GROUP_X", 80, 4),
    ("GROUP_Y", 84, 4),
    ("COORDINATE_UNITS", 88, 2),
    ("WEATHERING_VELOCITY", 90, 2),
    ("SUB_WEATHERING_VELOCITY", 92, 2),
    ("UPHOLE_TIME_AT_SOURCE", 94, 2),
    ("UPHOLE_TIME_AT_GROUP", 96, 2),
    ("SOURCE_STATIC_CORRECTION", 98, 2),
    ("GROUP_STATIC_CORRECTION", 100, 2),
    ("TOTAL_STATIC_CORRECTION", 102, 2),
    ("LAG_TIME_A", 104, 2),
    ("LAG_TIME_B", 106, 2),
    ("DELAY_RECORDING_TIME", 108, 2),
    ("MUTE_TIME_START", 110, 2),
    ("MUTE_TIME_END", 112, 2),
    ("SAMPLES", 114, 2),
    ("SAMPLE_INTERVAL", 116, 2),
    ("GAIN_TYPE", 118, 2),
    ("INSTRUMENT_GAIN_CONSTANT", 120, 2),
    ("INSTRUMENT_INITIAL_GAIN", 122, 2),
    ("CORRELATED", 124, 2),
    ("SWEEP_FREQUENCY_AT_START", 126, 2),
    ("SWEEP_FREQUENCY_AT_END", 128, 2),
    ("SWEEP_LENGTH", 130, 2),
    ("SWEEP_TYPE", 132, 2),
    ("SWEEP_TRACE_TAPER_LENGTH_AT_START", 134, 2),
    ("SWEEP_TRACE_TAPER_LENGTH_AT_END", 136, 2),
    ("TAPER_TYPE", 138, 2),
    ("ALIAS_FILTER_FREQUENCY", 140, 2),
    ("ALIAS_FILTER_SLOPE", 142, 2),
    ("NOTCH_FILTER_FREQUENCY", 144, 2),
    ("NOTCH_FILTER_SLOPE", 146, 2),
    ("LOW_CUT_FREQUENCY", 148, 2),
    ("HIGH_CUT_FREQUENCY", 150, 2),
    ("LOW_CUT_SLOPE", 152, 2),
    ("HIGH_CUT_SLOPE", 154, 2),
    ("YEAR", 156, 2),
    ("DAY_OF_YEAR", 158, 2),
    ("HOUR", 160, 2),
    ("MINUTE", 162, 2),
    ("SECOND", 164, 2),
    ("TIME_BASIC_CODE", 166, 2),
    ("TRACE_WEIGHTING_FACTOR", 168, 2),
    ("GEOPHONE_GROUP_NUMBER_OF_ROLL_SWITH", 170, 2),
    ("GEOPHONE_GROUP_NUMBER_OF_TRACE_NUMBER_ONE", 172, 2),
    ("GEOPHONE_GROUP_NUMBER_OF_LAST_TRACE", 174, 2),
    ("GAP_SIZE", 176, 2),
    ("OVER_TRAVEL", 178, 2),
]
TRACE_FIELDS_10 = [
    ("INLINE_NUMBER", 188, 4),
    ("CROSSLINE_NUMBER", 192, 4),
    ("SHOTPOINT_NUMBER", 196, 4),
    ("SHOTPOINT_SCALAR", 200, 2),
]
HEADER_FIELDS = [
    ("JOB_ID_NUMBER", 0, 4), ("LINE_NUMBER", 4, 4), ("REEL_NUMBER", 8, 4),
    ("DATA_TRACES_PER_ENSEMBLE", 12, 2), ("AUX_TRACES_PER_ENSEMBLE", 14, 2),
    ("SAMPLE_INTERVAL", 16, 2), ("SAMPLE_INTERVAL_ORIGINAL", 18, 2),
    ("SAMPLES_PER_DATA_TRACE", 20, 2),
    ("SAMPLES_PER_DATA_TRACE_ORIGINAL", 22, 2),
    ("DATA_SAMPLE_TYPE", 24, 2), ("ENSEMBLE_FOLD", 26, 2),
    ("TRACE_SORTING_CODE", 28, 2), ("VERTICAL_SUM_CODE", 30, 2),
    ("SWEEP_FREQUENCY_AT_START", 32, 2), ("SWEEP_FREQUENCY_AT_END", 34, 2),
    ("SWEEP_LENGTH", 36, 2), ("SWEEP_TYPE", 38, 2),
    ("TRACE_NUMBER_OF_SWEEP_CHANNEL", 40, 2),
    ("SWEEP_TRACE_TAPER_LENGTH_AT_START", 42, 2),
    ("SWEEP_TRACE_TAPER_LENGTH_AT_END", 44, 2),
    ("TAPER_TYPE", 46, 2), ("CORRELATED", 48, 2),
    ("BINARY_GAIN_RECOVERED", 50, 2), ("AMPLITUDE_RECOVERY_METHOD", 52, 2),
    ("MEASUREMENT_SYSTEM", 54, 2), ("IMPULSE_SIGNAL_POLARITY", 56, 2),
    ("VIBRATORY_POLARY_CODE", 58, 2),
]

_SAMPLE_BYTES = {1: 4, 2: 4, 3: 2, 4: 4, 5: 4, 8: 1}

# EBCDIC cp037 -> ASCII for the textual header
_EBCDIC = bytes(range(256)).decode("cp037", "replace")


def _i(data, off, size, signed=True):
    return int.from_bytes(data[off:off + size], "big", signed=signed)


def _ibm_to_float(raw: np.ndarray) -> np.ndarray:
    """IBM System/360 hex float -> float64."""
    sign = np.where(raw >> 31, -1.0, 1.0)
    exponent = ((raw >> 24) & 0x7F).astype(np.int64) - 64
    mantissa = (raw & 0x00FFFFFF).astype(np.float64) / float(1 << 24)
    return sign * mantissa * np.power(16.0, exponent)


class SEGYFile:
    def __init__(self, path: str):
        self.path = path
        data = open(path, "rb").read()
        text = data[:3200]
        if text[:1] != b"C":
            text = text.decode("cp037", "replace").encode("latin-1",
                                                          "replace")
        self.text_header = text.decode("latin-1").rstrip("\x00 ")
        bfh = data[3200:3600]
        self.header = {name: _i(bfh, off, size)
                       for name, off, size in HEADER_FIELDS}
        rev = _i(bfh, 300, 2, signed=False)
        self.header["SEGY_REVISION_NUMBER"] = rev
        self.header["SEGY_FLOAT_REVISION_NUMBER"] = rev / 256.0
        self.header["FIXED_LENGTH_TRACE_FLAG"] = _i(bfh, 302, 2)
        self.header["NUMBER_OF_EXTENDED_TEXTUAL_FILE_HEADER"] = \
            _i(bfh, 304, 2)
        self.is_rev1 = rev >= 0x0100
        self.data = data

    def trace_field_names(self):
        names = [n for n, _, _ in TRACE_FIELDS]
        if self.is_rev1:
            names += [n for n, _, _ in TRACE_FIELDS_10]
        return names + ["SAMPLE_ARRAY"]

    def header_field_names(self):
        return ["TEXT_HEADER"] + [n for n, _, _ in HEADER_FIELDS] + \
            ["SEGY_REVISION_NUMBER", "SEGY_FLOAT_REVISION_NUMBER",
             "FIXED_LENGTH_TRACE_FLAG",
             "NUMBER_OF_EXTENDED_TEXTUAL_FILE_HEADER"]

    def header_feature(self):
        return {"TEXT_HEADER": self.text_header, **self.header}

    def traces(self):
        """[(props incl SAMPLE_ARRAY, wkb point)]"""
        out = []
        pos = 3600
        data = self.data
        stype = self.header["DATA_SAMPLE_TYPE"]
        nbytes = _SAMPLE_BYTES.get(stype, 4)
        while pos + 240 <= len(data):
            th = data[pos:pos + 240]
            props = {n: _i(th, off, size)
                     for n, off, size in TRACE_FIELDS}
            if self.is_rev1:
                props.update({n: _i(th, off, size)
                              for n, off, size in TRACE_FIELDS_10})
            n_samples = props["SAMPLES"]
            if n_samples == 0:
                n_samples = self.header["SAMPLES_PER_DATA_TRACE"]
            if n_samples < 0:
                break
            raw = data[pos + 240:pos + 240 + n_samples * nbytes]
            if len(raw) < n_samples * nbytes:
                break
            if stype == 1:
                vals = _ibm_to_float(np.frombuffer(raw, ">u4"))
            elif stype == 2:
                vals = np.frombuffer(raw, ">i4").astype(np.float64)
            elif stype == 3:
                vals = np.frombuffer(raw, ">i2").astype(np.float64)
            elif stype == 8:
                vals = np.frombuffer(raw, np.int8).astype(np.float64)
            else:
                vals = np.frombuffer(raw, ">f4").astype(np.float64)
            props["SAMPLE_ARRAY"] = vals.tolist()

            hs = props["HORIZONTAL_SCALAR"]
            scale = hs if hs > 0 else (1.0 / -hs if hs < 0 else 1.0)
            if props["COORDINATE_UNITS"] == 2:
                scale /= 3600.0
            wkb = G.encode_point(props["GROUP_X"] * scale,
                                 props["GROUP_Y"] * scale)
            out.append((props, wkb))
            pos += 240 + n_samples * nbytes
        return out


def open_segy(path: str) -> SEGYFile:
    return SEGYFile(path)


def read_segy(spark, path: str, layer: str = "traces"):
    from gdal_spark.sources.formats import FEATURE_SCHEMA
    f = open_segy(path)
    src = os.path.basename(path)
    if layer == "header":
        rows = [(src, 0, json.dumps(f.header_feature()), None)]
    else:
        rows = [(src, i, json.dumps(props), wkb)
                for i, (props, wkb) in enumerate(f.traces())]
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
