from .seg_metrics import (
    SegMetric, SegMetricFull, SegmentationMetric, SegmentationMetricDetailed,
    batch_pix_accuracy, batch_intersection_union, get_classes_names,
)
