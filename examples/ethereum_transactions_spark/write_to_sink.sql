-- reference examples/ethereum_transactions/write_to_sink.sql:1-2
insert into sink
select * from buffer_{{.START}}_{{.END}}
