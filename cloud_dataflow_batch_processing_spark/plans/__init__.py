from cloud_dataflow_batch_processing_spark.plans.inspect import (
    executed_plan,
    formatted_plan,
    assert_pushed_filters,
    assert_read_schema_pruned,
    assert_broadcast_join,
    assert_no_cartesian,
    count_shuffles,
    count_plan_nodes,
    fan_out_scan,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "count_shuffles",
    "count_plan_nodes",
    "fan_out_scan",
]
