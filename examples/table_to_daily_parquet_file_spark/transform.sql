-- reference examples/table_to_daily_parquet_file/transform.sql:1-16 —
-- the day-range slice of the source; `date` is the export partition
-- column. The runtime prunes the source view to the `_part` (yyyyMM)
-- partitions covering [START, END], so each 1-day batch scans only the
-- months it needs.
select
    s.*,
    to_date(s.timestamp) as date
from source as s
where datediff(to_date(s.timestamp), date'1970-01-01') between {{.START}} and {{.END}}
