#!/bin/bash
# Round-5 relay watcher: probe the axon relay on a period; when it answers,
# run the round-5 campaign (tools/campaign5.py resumes by section).  Exit
# once every section is DONE (or failed twice) in tools/campaign5_results.txt.
cd /root/repo

ALL_SECTIONS="digitsnin ctctrain vgg16-profile resnet50-profile tpu-tests engines-b1024 engines-b2048 fusedval vgg16-b128 resnet50-b128 bench vgg16-profile2 digitsnin2 benchwarm eagerwarm tpu-tests2"

all_done() {
    [ -f tools/campaign5_results.txt ] || return 1
    for s in $ALL_SECTIONS; do
        if ! grep -q "=== DONE $s" tools/campaign5_results.txt; then
            nfail=$(grep -c "=== FAILED $s" tools/campaign5_results.txt)
            [ "$nfail" -ge 2 ] || return 1
        fi
    done
    return 0
}

while true; do
    if all_done; then
        echo "watcher5: campaign complete @ $(date +%H:%M:%S)"
        break
    fi
    if timeout 180 python -c "
import numpy as np, jax.numpy as jnp
a = jnp.ones((512,512), jnp.bfloat16)
np.asarray((a@a).ravel()[:1])
print('alive')
" >/dev/null 2>&1; then
        echo "watcher5: relay alive @ $(date +%H:%M:%S), launching campaign"
        timeout 14400 python tools/campaign5.py >> /tmp/campaign5.log 2>&1
        echo "watcher5: campaign window ended @ $(date +%H:%M:%S) (exit $?)"
    else
        echo "watcher5: relay wedged @ $(date +%H:%M:%S), sleeping 10 min"
    fi
    sleep 600
done
