.PHONY: all native test bench check clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

# Round-close gate: the FULL suite must be green before any snapshot
# commit. Appends a machine-checkable record to PROGRESS.jsonl on
# success; fails loudly (and records the failure) otherwise.
check: native
	python -m pytest tests/ -q && \
	  python -c "import json,subprocess,datetime; \
	    sha=subprocess.run(['git','rev-parse','--short','HEAD'],capture_output=True,text=True).stdout.strip(); \
	    open('PROGRESS.jsonl','a').write(json.dumps({'event':'suite-green','sha':sha,'date':datetime.datetime.now(datetime.timezone.utc).isoformat()})+'\n'); \
	    print('suite green @',sha,'— recorded in PROGRESS.jsonl')"

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
