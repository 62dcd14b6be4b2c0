-- reference examples/decoded_logs_to_daily_parquet_file/tip.sql:1-3 — export up
-- to YESTERDAY relative to the newest source row (today may still grow)
select datediff(max(to_date(timestamp)), date'1970-01-01') - 1 as tip
from source
