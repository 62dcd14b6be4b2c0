-- reference examples/decoded_logs_to_daily_parquet_file/transform.sql:1-21
-- — the day-range slice of the decoded sink. The reference's
-- toJSONString(inputs) converts ClickHouse's native JSON column to its
-- string wire form; our decoded sink already stores `inputs` as that
-- JSON string, so the projection passes it through unchanged. The
-- runtime prunes the source view to the `_part` (yyyyMM) partitions
-- covering [START, END].
select
    s.*,
    to_date(s.timestamp) as date
from source as s
where datediff(to_date(s.timestamp), date'1970-01-01') between {{.START}} and {{.END}}
