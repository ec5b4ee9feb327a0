from frn_tpu.data.collate import collate_fixed
from frn_tpu.data.csv_dataset import CSVDetectionDataset, load_annotations_csv, load_class_map
from frn_tpu.data.events import H5EventReader, write_event_h5
from frn_tpu.data.loader import BatchLoader, device_prefetch

__all__ = [
    "collate_fixed",
    "CSVDetectionDataset",
    "load_annotations_csv",
    "load_class_map",
    "H5EventReader",
    "write_event_h5",
    "BatchLoader",
    "device_prefetch",
]
