from gdpathtracing_tpu.cli import main

main()
