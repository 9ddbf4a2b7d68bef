#!/usr/bin/env python
"""Generate a CuPL-style per-class prompt table for imagenet1k (VERDICT r4 #6).

The reference CLI consumes ``cupl_prompts.json`` through
``--custom_template_file`` (reference CLIP_benchmark cli.py:57;
metrics/zeroshot_classification.py:43-46 uses ``templates[classname]``), but
its own table is stripped from the repo (.MISSING_LARGE_BLOBS) and the CuPL
originals (GPT-3 generated, Pratt et al. 2022) are unfetchable zero-egress.
This tool SYNTHESIZES a deterministic substitute in the same schema and
style: per-class descriptive sentences, specialised by a coarse KIND
(dog breed / bird / vehicle / food / ...) inferred from the classname via
keyword tables plus the well-established ImageNet index ranges (151-268 are
dog breeds; 0-397 animals; 398+ artifacts).  Quality is below real CuPL
(no per-class visual facts), but every class gets class-specific sentences
with the correct consumption path, schema, and scale (1000 classes).

Usage:
  python tools/make_cupl_imagenet.py            # rewrites the shipped table
  python tools/make_cupl_imagenet.py --check    # verify shipped == generated
"""
import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LANG = os.path.join(REPO, "iterated_learning_for_vlm_tpu", "eval", "languages")

# keyword -> kind.  First match wins; checked word-by-word on the lowercased
# classname (longest keywords first within a kind are unnecessary: any word
# hit counts).
KIND_KEYWORDS = {
    "dog": """terrier spaniel retriever hound setter pointer sheepdog collie
        corgi poodle pug beagle dalmatian chihuahua pekinese pekingese shih-tzu
        papillon basenji malamute husky dingo dhole schnauzer doberman
        rottweiler mastiff bulldog greyhound whippet borzoi saluki vizsla
        weimaraner newfoundland pyrenees samoyed pomeranian chow keeshond
        griffon affenpinscher pinscher leonberg kuvasz komondor briard kelpie
        malinois bouvier appenzeller entlebucher boxer bullmastiff
        ridgeback wolfhound elkhound otterhound deerhound foxhound bluetick
        redbone coonhound airedale cairn dandie sealyham lakeland kerry
        wheaten groenendael mexican-hairless pembroke cardigan puppy""",
    "cat": "cat tabby kitten siamese persian angora manx lynx leopard jaguar "
           "lion tiger cheetah cougar panther snow-leopard",
    "bird": """cock hen ostrich brambling goldfinch junco bunting robin bulbul
        jay magpie chickadee ouzel kite eagle vulture owl grouse ptarmigan
        partridge peacock quail parrot macaw cockatoo lorikeet coucal bee-eater
        hornbill hummingbird jacamar toucan drake merganser goose swan crane
        bustard rail coot bittern heron egret flamingo ibis spoonbill stork
        pelican albatross penguin auk puffin gull tern sandpiper redshank
        dowitcher oystercatcher limpkin gallinule avocet woodpecker finch
        warbler sparrow swallow kingfisher duck""",
    "fish": """tench goldfish shark ray eel salmon trout barracouta sturgeon
        gar lionfish puffer rockfish anemone-fish coho stingray hammerhead""",
    "reptile": """turtle terrapin tortoise lizard iguana chameleon gecko
        agama gila alligator crocodile snake boa python cobra mamba viper
        rattlesnake sidewinder adder asp triceratops komodo anole whiptail""",
    "amphibian": "salamander newt axolotl frog toad eft triton bullfrog",
    "arachnid": "spider tarantula scorpion harvestman tick garden-spider "
                "black-widow wolf-spider barn-spider",
    "insect": """beetle ladybug weevil fly bee ant grasshopper cricket mantis
        cicada leafhopper lacewing dragonfly damselfly butterfly admiral
        ringlet monarch cabbage sulphur lycaenid cockroach centipede
        trilobite isopod moth""",
    "marine_invertebrate": """jellyfish anemone coral flatworm nematode conch
        snail slug sea-slug chiton nautilus crab lobster crayfish hermit-crab
        starfish urchin sea-cucumber chambered""",
    "primate": """orangutan gorilla chimpanzee gibbon siamang guenon patas
        baboon macaque langur colobus proboscis marmoset capuchin howler titi
        spider-monkey squirrel-monkey madagascar-cat indri lemur monkey""",
    "wild_mammal": """wolf fox coyote jackal hyena bear mongoose meerkat
        wombat echidna platypus wallaby koala opossum beaver marmot porcupine
        squirrel hamster guinea-pig zebra hog boar warthog hippopotamus ox
        buffalo bison ram bighorn ibex hartebeest impala gazelle camel llama
        weasel mink polecat ferret otter skunk badger armadillo sloth mole
        hare rabbit elephant mouse rat panda deer elk moose antelope mustelid
        marsupial ungulate sea-lion dugong whale grampus""",
    "fungus": "mushroom agaric fungus bolete stinkhorn earthstar hen-of-the-"
              "woods coral-fungus gyromitra",
    "vehicle": """ambulance beach-wagon cab convertible jeep limousine minivan
        model-t racer sports-car truck trailer-truck tow-truck pickup police
        van moving-van fire-engine garbage-truck go-kart golfcart snowplow
        tractor forklift streetcar trolleybus bus minibus school-bus
        recreational-vehicle moped motor-scooter mountain-bike bicycle
        tricycle unicycle motorcycle snowmobile bobsled dogsled horse-cart
        oxcart jinrikisha amphibian-vehicle half-track tank thresher
        harvester freight-car passenger-car electric-locomotive
        steam-locomotive""",
    "boat": """canoe kayak gondola lifeboat speedboat catamaran trimaran yawl
        schooner pirate fireboat container-ship liner aircraft-carrier
        submarine wreck paddlewheel ship boathouse""",
    "aircraft": "airliner warplane airship balloon parachute space-shuttle "
                "missile projectile rocket",
    "instrument": """accordion banjo cello violin fiddle harp grand-piano
        upright organ harmonica ocarina flute oboe bassoon sax saxophone
        cornet trombone french-horn trumpet drum bongo maraca marimba chime
        gong steel-drum panpipe whistle harmonium""",
    "food": """bagel pretzel cheeseburger hotdog hot-dog pizza burrito
        guacamole consomme trifle ice-cream ice-lolly french-loaf meat-loaf
        potpie dough carbonara chocolate-sauce mashed-potato espresso eggnog
        menu plate red-wine cup""",
    "produce": """broccoli cauliflower cabbage artichoke cardoon cucumber
        zucchini spaghetti-squash acorn-squash butternut-squash bell-pepper
        mushroom granny-smith strawberry orange lemon fig pineapple banana
        jackfruit custard-apple pomegranate rapeseed corn acorn hip buckeye
        ear""",
    "clothing": """abaya cardigan jersey sweatshirt kimono poncho suit tuxedo
        brassiere diaper gown hoopskirt jean miniskirt overskirt sarong
        swimming-trunks bikini maillot pajama apron lab-coat trench-coat
        fur-coat vestment uniform military-uniform bow-tie windsor-tie
        feather-boa stole mitten sock christmas-stocking cowboy-boot clog
        loafer running-shoe sandal shoe bonnet sombrero cowboy-hat bathing-cap
        shower-cap mortarboard academic-gown crash-helmet football-helmet
        bearskin busby shako pickelhaube wig scarf glove""",
    "structure": """castle palace monastery church mosque stupa dome bell-cote
        barn boathouse greenhouse apiary birdhouse dock pier breakwater dam
        viaduct suspension-bridge steel-arch-bridge bannister fence picket
        chainlink stone-wall brick cliff-dwelling yurt mobile-home thatch
        tile-roof triumphal-arch obelisk fountain maze patio terrace altar
        library planetarium prison lumbermill shoe-shop bookshop butcher-shop
        bakery barbershop confectionery grocery-store tobacco-shop toyshop
        restaurant cinema home-theater beacon lighthouse water-tower
        traffic-light street-sign turnstile scaffold megalith""",
    "device": """computer laptop notebook desktop monitor screen keyboard
        mouse joystick modem printer photocopier scanner projector typewriter
        cassette cassette-player tape-player cd-player ipod radio television
        remote-control cellular-telephone dial-telephone pay-phone
        loudspeaker microphone headphone oscilloscope voltmeter seismograph
        spectrometer geiger hard-disc slide-rule abacus calculator camera
        polaroid reflex-camera webcam binoculars telescope loupe microscope
        magnifier projector stopwatch digital-watch digital-clock wall-clock
        analog-clock parking-meter sundial hourglass odometer barometer
        scale space-heater stove dutch-oven rotisserie toaster waffle-iron
        espresso-maker coffeepot teapot crock-pot slow-cooker microwave
        refrigerator icebox washer dishwasher vacuum sewing-machine iron
        hair-dryer curling-iron electric-fan heater guillotine mousetrap
        switch solar-dish""",
    "tool": """hammer hatchet cleaver letter-opener opener corkscrew can-opener
        screwdriver plunger shovel spade rake plow hoe chain-saw chainsaw saw
        plane carpenter power-drill lawn-mower mower scissors shears knife
        screw nail bolt padlock combination-lock hook quill pen ballpoint
        pencil-sharpener pencil-box rubber-eraser stapler syringe
        stethoscope""",
    "container": """barrel bucket pail jug pitcher vase urn amphora bottle
        pop-bottle beer-bottle wine-bottle water-bottle pill-bottle jar
        beaker flask thermos carton crate chest safe mailbox ashcan trash-can
        rain-barrel watering-can caldron cauldron pot mortar wok frying-pan
        skillet saucepan ladle spatula strainer colander mixing-bowl soup-bowl
        petri-dish tray bathtub tub washbasin sink soap-dispenser milk-can
        measuring-cup shopping-basket hamper punching-bag purse wallet
        backpack plastic-bag mailbag sleeping-bag suitcase lunchbox pencil-box
        matchstick quiver holster scabbard envelope binder wardrobe chiffonier
        medicine-chest china-cabinet bookcase vault""",
    "furniture": """chair rocking-chair folding-chair barber-chair throne
        park-bench studio-couch table desk pool-table dining-table bed
        four-poster crib cradle bassinet hammock wardrobe dresser file
        entertainment-center shoji window-screen window-shade fire-screen
        mosquito-net curtain theater-curtain shower-curtain quilt comforter
        pillow""",
    "sports": """ball baseball basketball croquet golf-ball ping-pong
        puck racket racquet tennis soccer volleyball rugby football
        dumbbell barbell horizontal-bar parallel-bars balance-beam
        pommel-horse springboard ski snowboard surfboard paddle oar
        bathing-trunks swing seesaw carousel""",
    "weapon": "rifle revolver pistol assault-rifle cannon bow arrow "
              "letter-bomb",
}

# ImageNet index facts that keywords can miss: 151-268 are dog breeds,
# 0-397 animals, 398-999 artifacts/food/plants.
DOG_RANGE = range(151, 269)

# kind -> (article phrase, CuPL-style sentence templates).  {c}=classname.
KIND_PROMPTS = {
    "dog": [
        "a photo of a {c}, a breed of dog.",
        "a {c} dog standing outdoors, photographed at eye level.",
        "a close-up photo of a {c}'s face, showing its characteristic features.",
        "a {c} playing in a park.",
        "a photograph of a {c} on a leash next to its owner.",
        "the {c} is a distinctive dog breed with a recognizable coat and build.",
    ],
    "cat": [
        "a photo of a {c}, a feline animal.",
        "a {c} resting and watching its surroundings.",
        "a close-up photograph of a {c}'s face with whiskers and alert eyes.",
        "a {c} moving silently through its territory.",
        "a wildlife-style photo of a {c}.",
    ],
    "bird": [
        "a photo of a {c}, a species of bird.",
        "a {c} perched on a branch.",
        "a photograph of a {c} in flight with wings spread.",
        "a close-up photo of a {c} showing its beak and plumage.",
        "a {c} in its natural habitat.",
    ],
    "fish": [
        "a photo of a {c}, an aquatic animal.",
        "a {c} swimming underwater.",
        "an underwater photograph of a {c} with fins and scales visible.",
        "a {c} in clear water, photographed from the side.",
        "a close-up of a {c} in an aquarium.",
    ],
    "reptile": [
        "a photo of a {c}, a reptile.",
        "a {c} basking on a warm rock.",
        "a close-up photograph of a {c} showing its scaly skin.",
        "a {c} in its natural habitat.",
        "a wildlife photo of a {c} at ground level.",
    ],
    "amphibian": [
        "a photo of a {c}, an amphibian.",
        "a {c} near the water's edge.",
        "a close-up photograph of a {c} with moist, smooth skin.",
        "a {c} on a leaf in a damp forest.",
    ],
    "arachnid": [
        "a photo of a {c}, an arachnid.",
        "a macro photograph of a {c} showing its eight legs.",
        "a {c} on its web or on the ground.",
        "a close-up of a {c} in its natural habitat.",
    ],
    "insect": [
        "a photo of a {c}, an insect.",
        "a macro photograph of a {c} on a plant.",
        "a {c} with its wings and antennae visible.",
        "a close-up of a {c} in a garden.",
    ],
    "marine_invertebrate": [
        "a photo of a {c}, a marine invertebrate.",
        "a {c} on the sea floor.",
        "an underwater photograph of a {c}.",
        "a close-up of a {c} in a tide pool.",
    ],
    "primate": [
        "a photo of a {c}, a primate.",
        "a {c} in the trees of its forest habitat.",
        "a close-up photograph of a {c}'s expressive face.",
        "a {c} climbing or foraging.",
    ],
    "wild_mammal": [
        "a photo of a {c}, a wild mammal.",
        "a {c} in its natural habitat.",
        "a wildlife photograph of a {c} in the open.",
        "a close-up photo of a {c} showing its fur.",
    ],
    "fungus": [
        "a photo of a {c}, a type of fungus.",
        "a {c} growing on the forest floor.",
        "a close-up photograph of a {c} showing its cap and stem.",
        "a cluster of {c} among fallen leaves.",
    ],
    "vehicle": [
        "a photo of a {c}, a type of vehicle.",
        "a {c} on the road.",
        "a photograph of a parked {c} from the side.",
        "a close-up of a {c} showing its wheels and body.",
        "a {c} in motion.",
    ],
    "boat": [
        "a photo of a {c}, a type of watercraft.",
        "a {c} on the water.",
        "a photograph of a {c} near a dock or harbor.",
        "a {c} seen from the shore.",
    ],
    "aircraft": [
        "a photo of a {c}.",
        "a {c} in the sky.",
        "a photograph of a {c} from below.",
        "a {c} on the ground before departure.",
    ],
    "instrument": [
        "a photo of a {c}, a musical instrument.",
        "a {c} on a stage.",
        "a close-up photograph of a {c} showing its details.",
        "a musician playing a {c}.",
    ],
    "food": [
        "a photo of {c}, a type of food.",
        "a plate of {c} ready to eat.",
        "a close-up photograph of freshly prepared {c}.",
        "{c} served at a table.",
    ],
    "produce": [
        "a photo of a {c}.",
        "fresh {c} at a market stall.",
        "a close-up photograph of a {c} showing its color and texture.",
        "a pile of {c} on a kitchen counter.",
    ],
    "clothing": [
        "a photo of a {c}, an article of clothing.",
        "a person wearing a {c}.",
        "a {c} on display.",
        "a close-up photograph of a {c} showing its fabric and cut.",
    ],
    "structure": [
        "a photo of a {c}.",
        "a photograph of a {c} seen from the outside.",
        "a wide shot of a {c} and its surroundings.",
        "a {c} photographed in daylight.",
    ],
    "device": [
        "a photo of a {c}, a device.",
        "a {c} on a desk or counter.",
        "a close-up photograph of a {c} showing its controls.",
        "a {c} in use.",
    ],
    "tool": [
        "a photo of a {c}, a tool.",
        "a {c} on a workbench.",
        "a close-up photograph of a {c} against a plain background.",
        "a person using a {c}.",
    ],
    "container": [
        "a photo of a {c}.",
        "a {c} sitting on a surface.",
        "a close-up photograph of a {c} showing its shape.",
        "a {c} in everyday use.",
    ],
    "furniture": [
        "a photo of a {c}, a piece of furniture.",
        "a {c} in a furnished room.",
        "a photograph of a {c} against a wall.",
        "a close-up of a {c} showing its design.",
    ],
    "sports": [
        "a photo of a {c}, sports equipment.",
        "a {c} on a playing field or court.",
        "a close-up photograph of a {c}.",
        "an athlete with a {c}.",
    ],
    "weapon": [
        "a photo of a {c}.",
        "a {c} on display against a plain background.",
        "a close-up photograph of a {c}.",
    ],
    "animal": [
        "a photo of a {c}, an animal.",
        "a {c} in its natural habitat.",
        "a wildlife photograph of a {c}.",
        "a close-up photo of a {c}.",
    ],
    "object": [
        "a photo of a {c}.",
        "a photograph of a {c} in its usual setting.",
        "a close-up photo of a {c}.",
        "a {c} photographed against a neutral background.",
    ],
}

_WORD = re.compile(r"[a-z][a-z-]+")


def _kind_of(classname: str, index: int) -> str:
    if index in DOG_RANGE:
        return "dog"
    lower = classname.lower().split(",")[0].strip()
    words = _WORD.findall(lower)
    joined = lower.replace(" ", "-")
    # match passes, most to least specific: the full joined name
    # ("wolf-spider" -> arachnid, "sea-slug" -> marine), then the HEAD noun
    # (last word: "tiger shark" -> fish via "shark", not cat via "tiger"),
    # then any word
    probes = [{joined}]
    if words:
        probes.append({words[-1], words[-1].replace("-", "")})
    probes.append(set(words) | {w.replace("-", "") for w in words})
    for probe in probes:
        for kind, kws in KIND_KEYWORDS.items():
            if probe & set(kws.split()):
                return kind
    return "animal" if index <= 397 else "object"


def _fill(template: str, name: str) -> str:
    """Instantiate {c} with an/a agreement at the insertion points."""
    if name[:1].lower() in "aeiou":
        template = template.replace("a {c}", "an {c}").replace(
            "A {c}", "An {c}")
    return template.format(c=name)


def generate(classnames):
    table = {}
    for i, name in enumerate(classnames):
        kind = _kind_of(name, i)
        table[name] = [_fill(t, name) for t in KIND_PROMPTS[kind]]
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify the shipped table matches the generator")
    args = ap.parse_args()
    with open(os.path.join(LANG, "en_classnames.json")) as f:
        classnames = json.load(f)["imagenet1k"]
    assert len(classnames) == 1000
    table = generate(classnames)
    dest = os.path.join(LANG, "cupl_prompts.json")
    with open(dest) as f:
        data = json.load(f)
    if args.check:
        if data.get("imagenet1k") != table:
            print("MISMATCH: shipped imagenet1k CuPL table != generator output")
            sys.exit(1)
        print("ok: shipped table matches generator")
        return
    data["imagenet1k"] = table
    with open(dest, "w") as f:
        json.dump(data, f, indent=1, ensure_ascii=False)
    kinds = {}
    for i, n in enumerate(classnames):
        kinds[_kind_of(n, i)] = kinds.get(_kind_of(n, i), 0) + 1
    print(f"wrote {dest}: 1000 classes, "
          f"{sum(len(v) for v in table.values())} prompts")
    print("kind coverage:", dict(sorted(kinds.items(), key=lambda x: -x[1])))


if __name__ == "__main__":
    main()
