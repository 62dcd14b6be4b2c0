drop temporary table buffer_{{.START}}_{{.END}}
