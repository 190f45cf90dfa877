"""EBML/Matroska element-schema registry.

Built from the public Matroska + EBML specifications (RFC 8794 and
matroska.org element tables) — the same public source the reference's
registry derives from (/root/reference/ebml.py:14-122, self-described
as an incomplete list). The registry is *data*, not code: the scan
stage looks element ids up via a broadcast join / map literal, so the
schema system stays fixed-but-permissive (unknown ids -> null name and
type, tolerated and skipped — ref ebml.py:293-297).

Covers the element families the pipeline touches (EBML header, Segment
/ Info / Tracks / Cluster / Block, Tags incl. the AWS KVS per-fragment
tag carriers) plus enough structure to parse any well-formed stream
permissively.
"""

from __future__ import annotations

import enum


class EbmlType(str, enum.Enum):
    SINT = "SINT"
    UINT = "UINT"
    FLOAT = "FLOAT"
    STRING = "STRING"
    UTF8 = "UTF8"
    DATE = "DATE"
    MASTER = "MASTER"
    BINARY = "BINARY"


_M = EbmlType.MASTER
_U = EbmlType.UINT
_S = EbmlType.STRING
_U8 = EbmlType.UTF8
_B = EbmlType.BINARY
_F = EbmlType.FLOAT
_D = EbmlType.DATE
_I = EbmlType.SINT

# id -> (name, type). Ids are the full EBML ids including marker bits,
# per RFC 8794 §5 / matroska.org "Element ID" column.
EBML_REGISTRY: dict[int, tuple[str, EbmlType]] = {
    # EBML header (RFC 8794 §11.2)
    0x1A45DFA3: ("EBML", _M),
    0x4286: ("EBMLVersion", _U),
    0x42F7: ("EBMLReadVersion", _U),
    0x42F2: ("EBMLMaxIDLength", _U),
    0x42F3: ("EBMLMaxSizeLength", _U),
    0x4282: ("DocType", _S),
    0x4287: ("DocTypeVersion", _U),
    0x4285: ("DocTypeReadVersion", _U),
    # Global
    0xBF: ("CRC-32", _B),
    0xEC: ("Void", _B),
    # Segment
    0x18538067: ("Segment", _M),
    # Meta seek
    0x114D9B74: ("SeekHead", _M),
    0x4DBB: ("Seek", _M),
    0x53AB: ("SeekID", _B),
    0x53AC: ("SeekPosition", _U),
    # Segment info
    0x1549A966: ("Info", _M),
    0x73A4: ("SegmentUID", _B),
    0x7384: ("SegmentFilename", _U8),
    0x2AD7B1: ("TimestampScale", _U),
    0x4489: ("Duration", _F),
    0x4461: ("DateUTC", _D),
    0x7BA9: ("Title", _U8),
    0x4D80: ("MuxingApp", _U8),
    0x5741: ("WritingApp", _U8),
    # Cluster
    0x1F43B675: ("Cluster", _M),
    0xE7: ("Timestamp", _U),
    0xA7: ("Position", _U),
    0xAB: ("PrevSize", _U),
    0xA3: ("SimpleBlock", _B),
    0xA0: ("BlockGroup", _M),
    0xA1: ("Block", _B),
    0x75A1: ("BlockAdditions", _M),
    0xA6: ("BlockMore", _M),
    0xEE: ("BlockAddID", _U),
    0xA5: ("BlockAdditional", _B),
    0x9B: ("BlockDuration", _U),
    0xFB: ("ReferenceBlock", _I),
    # Tracks
    0x1654AE6B: ("Tracks", _M),
    0xAE: ("TrackEntry", _M),
    0xD7: ("TrackNumber", _U),
    0x73C5: ("TrackUID", _U),
    0x83: ("TrackType", _U),
    0xB9: ("FlagEnabled", _U),
    0x88: ("FlagDefault", _U),
    0x9C: ("FlagLacing", _U),
    0x23E383: ("DefaultDuration", _U),
    0x536E: ("Name", _U8),
    0x22B59C: ("Language", _S),
    0x86: ("CodecID", _S),
    0x63A2: ("CodecPrivate", _B),
    0x258688: ("CodecName", _U8),
    0xE0: ("Video", _M),
    0x9A: ("FlagInterlaced", _U),
    0xB0: ("PixelWidth", _U),
    0xBA: ("PixelHeight", _U),
    0x54B0: ("DisplayWidth", _U),
    0x54BA: ("DisplayHeight", _U),
    0xE1: ("Audio", _M),
    0xB5: ("SamplingFrequency", _F),
    0x9F: ("Channels", _U),
    0x6264: ("BitDepth", _U),
    # Cueing
    0x1C53BB6B: ("Cues", _M),
    0xBB: ("CuePoint", _M),
    0xB3: ("CueTime", _U),
    0xB7: ("CueTrackPositions", _M),
    0xF7: ("CueTrack", _U),
    0xF1: ("CueClusterPosition", _U),
    # Attachments / Chapters
    0x1941A469: ("Attachments", _M),
    0x61A7: ("AttachedFile", _M),
    0x467E: ("FileDescription", _U8),
    0x466E: ("FileName", _U8),
    0x4660: ("FileMediaType", _S),
    0x465C: ("FileData", _B),
    0x46AE: ("FileUID", _U),
    0x1043A770: ("Chapters", _M),
    # Tags — the family carrying AWS KVS per-fragment metadata
    # (TagName/TagString pairs, the reference's pivot source,
    # /root/reference/parser.py:349-360)
    0x1254C367: ("Tags", _M),
    0x7373: ("Tag", _M),
    0x63C0: ("Targets", _M),
    0x68CA: ("TargetTypeValue", _U),
    0x63CA: ("TargetType", _S),
    0x63C5: ("TagTrackUID", _U),
    0x67C8: ("SimpleTag", _M),
    0x45A3: ("TagName", _U8),
    0x447A: ("TagLanguage", _S),
    0x4484: ("TagDefault", _U),
    0x4487: ("TagString", _U8),
    0x4485: ("TagBinary", _B),
}


def registry_df(spark):
    """The registry as a broadcastable DataFrame (element_id, name,
    ebml_type) — scan output joins against this for schema resolution.
    """
    rows = [
        (eid, name, etype.value) for eid, (name, etype) in EBML_REGISTRY.items()
    ]
    return spark.createDataFrame(rows, "element_id bigint, name string, ebml_type string")
